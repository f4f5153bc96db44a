package graft.sources

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.sparkproject.connect.grpc.{Metadata, Server, ServerCall, ServerCallHandler, ServerInterceptor, ServerInterceptors, ServerServiceDefinition, Status}
import org.sparkproject.connect.grpc.inprocess.InProcessServerBuilder
import org.sparkproject.connect.grpc.stub.{ServerCalls, StreamObserver}

import graft.functions.ReplayIdCodec
import graft.sources.PubSubProto._

/** In-process double of the Salesforce Pub/Sub service — the server side
  * the reference's Node client talks to, reproduced from its DOCUMENTED
  * behavior so [[PubSubClient]] can be specced against a real gRPC wire
  * (marshalling, metadata, flow control, stream status codes) without a
  * network or a live org. Semantics verified against the reference:
  *
  *  - auth: every RPC must carry `accesstoken`/`instanceurl`/`tenantid`
  *    metadata (`proto:330-333`); anything else → UNAUTHENTICATED;
  *  - `Subscribe`: pull-based flow control (`proto:336-360`) — the
  *    server delivers at most the outstanding `num_requested`, in
  *    responses of ≤ `maxServerBatch` events; the replay preset is
  *    honored only on the FIRST request; a later request naming a
  *    different topic is INVALID_ARGUMENT; a CUSTOM replay ID older than
  *    retention errors the stream OUT_OF_RANGE;
  *  - keepalive: [[tickKeepalive]] pushes an empty `FetchResponse` with
  *    `latest_replay_id` + `pending_num_requested` to every live stream
  *    (`proto:164-166`, ≤ every 270 s in production — the spec ticks it
  *    explicitly instead of waiting);
  *  - `GetSchema` / `GetTopic`: registry lookups, NOT_FOUND when absent;
  *  - `Publish`: appends to the topic log (monotonic replay IDs), one
  *    `PublishResult` per event with the event's id echoed as the
  *    correlation key (the reference sets `id = correlationKey`,
  *    `client.js:555-580`);
  *  - `ManagedSubscribe`: resumes from the server-stored commit;
  *    `CommitReplayRequest` persists the replay ID and acks with a
  *    `CommitReplayResponse` (`proto:289-315`).
  */
class PubSubTestServer(expectedAccessToken: String,
                       expectedInstanceUrl: String,
                       expectedTenantId: String,
                       maxServerBatch: Int = 100) {

  private final class TopicState {
    val events = new ArrayBuffer[(Long, ProducerEvent)]() // replayId asc
    var retentionStart: Long = 1L // oldest replay id still retained
    val nextReplayId = new AtomicLong(1L)
    def latest: Long = synchronized {
      if (events.isEmpty) 0L else events.last._1
    }
  }

  private val topics = TrieMap.empty[String, TopicState]
  private val schemas = TrieMap.empty[String, String]
  // managed subscription id -> (topic, committed replay id)
  private val managed = TrieMap.empty[String, (String, Option[Long])]

  private final class SubState(val topic: String,
                               val resp: StreamObserver[FetchResponse]) {
    var cursor: Long = 0L // deliver events with replayId > cursor
    var pending: Int = 0
    var dead = false
  }
  private val subs = new ArrayBuffer[SubState]()

  @volatile private var server: Server = _
  @volatile var authedCalls: Int = 0 // spec introspection

  // ------------------------------------------------------------ fixtures

  def putSchema(id: String, json: String): Unit = schemas.put(id, json)

  def defineManagedSubscription(id: String, topic: String): Unit =
    managed.put(id, (topic, None))

  def committed(subscriptionId: String): Option[Long] =
    managed.get(subscriptionId).flatMap(_._2)

  /** Append events to a topic; returns their replay IDs. Wakes any live
    * subscription on the topic (the server push path). */
  def publishDirect(topic: String, events: Seq[ProducerEvent]): Seq[Long] = {
    val st = topics.getOrElseUpdate(topic, new TopicState)
    val ids = st.synchronized {
      events.map { e =>
        val rid = st.nextReplayId.getAndIncrement()
        st.events += ((rid, e))
        rid
      }
    }
    drainAll(topic)
    ids
  }

  /** Raise the retention floor: replay IDs below `newStart` are gone —
    * the precondition for OUT_OF_RANGE on old CUSTOM resumes. */
  def expireBefore(topic: String, newStart: Long): Unit = {
    val st = topics.getOrElseUpdate(topic, new TopicState)
    st.synchronized {
      st.retentionStart = newStart
      val keep = st.events.filter(_._1 >= newStart)
      st.events.clear()
      st.events ++= keep
    }
  }

  def latestReplayId(topic: String): Long =
    topics.get(topic).map(_.latest).getOrElse(0L)

  /** Live (not half-closed) subscribe streams — spec synchronization:
    * `subscribe()` returns before the server has processed the first
    * FetchRequest, so a test that pushes server-initiated traffic
    * (keepalives) first waits for the registration. */
  def activeSubscriptions: Int = subs.synchronized(subs.count(!_.dead))

  /** Push the ≤270 s keepalive to every live subscription. */
  def tickKeepalive(): Unit = subs.synchronized {
    subs.filterNot(_.dead).foreach { s =>
      val st = topics(s.topic)
      s.synchronized {
        s.resp.onNext(FetchResponse(Nil,
          ReplayIdCodec.encode(st.latest), pendingNumRequested = s.pending))
      }
    }
  }

  // ------------------------------------------------------------ lifecycle

  /** Start the in-process server; returns the channel name to dial. */
  def start(): String = {
    val name = InProcessServerBuilder.generateName()
    // default (pooled) executor, NOT directExecutor: bidi flow control
    // re-requests from inside the client's onNext, and a direct executor
    // would run that reentrantly on the delivery thread
    server = InProcessServerBuilder.forName(name)
      .addService(ServerInterceptors.intercept(serviceDefinition, authInterceptor))
      .build()
      .start()
    name
  }

  def stop(): Unit = {
    subs.synchronized { subs.foreach(_.dead = true); subs.clear() }
    if (server != null) server.shutdownNow()
  }

  // ----------------------------------------------------------------- auth

  private def authInterceptor: ServerInterceptor = new ServerInterceptor {
    override def interceptCall[ReqT, RespT](
        call: ServerCall[ReqT, RespT], headers: Metadata,
        next: ServerCallHandler[ReqT, RespT]): ServerCall.Listener[ReqT] = {
      val ok = headers.get(PubSubGrpc.AccessTokenKey) == expectedAccessToken &&
        headers.get(PubSubGrpc.InstanceUrlKey) == expectedInstanceUrl &&
        headers.get(PubSubGrpc.TenantIdKey) == expectedTenantId
      if (!ok) {
        call.close(Status.UNAUTHENTICATED.withDescription(
          "missing or invalid accesstoken/instanceurl/tenantid metadata"),
          new Metadata())
        new ServerCall.Listener[ReqT] {}
      } else {
        authedCalls += 1
        next.startCall(call, headers)
      }
    }
  }

  // -------------------------------------------------------------- service

  private def serviceDefinition: ServerServiceDefinition =
    ServerServiceDefinition.builder("eventbus.v1.PubSub")
      .addMethod(PubSubGrpc.SubscribeMethod,
        ServerCalls.asyncBidiStreamingCall(subscribeHandler))
      .addMethod(PubSubGrpc.ManagedSubscribeMethod,
        ServerCalls.asyncBidiStreamingCall(managedHandler))
      .addMethod(PubSubGrpc.GetSchemaMethod,
        ServerCalls.asyncUnaryCall(getSchemaHandler))
      .addMethod(PubSubGrpc.GetTopicMethod,
        ServerCalls.asyncUnaryCall(getTopicHandler))
      .addMethod(PubSubGrpc.PublishMethod,
        ServerCalls.asyncUnaryCall(publishHandler))
      .build()

  private def getSchemaHandler =
    new ServerCalls.UnaryMethod[SchemaRequest, SchemaInfo] {
      override def invoke(req: SchemaRequest,
                          resp: StreamObserver[SchemaInfo]): Unit =
        schemas.get(req.schemaId) match {
          case Some(json) =>
            resp.onNext(SchemaInfo(json, req.schemaId, rpcId = "rpc-schema"))
            resp.onCompleted()
          case None => resp.onError(Status.NOT_FOUND
            .withDescription(s"schema ${req.schemaId} not found")
            .asRuntimeException())
        }
    }

  private def getTopicHandler =
    new ServerCalls.UnaryMethod[TopicRequest, TopicInfo] {
      override def invoke(req: TopicRequest,
                          resp: StreamObserver[TopicInfo]): Unit =
        if (topics.contains(req.topicName)) {
          resp.onNext(TopicInfo(req.topicName, expectedTenantId,
            canPublish = true, canSubscribe = true, schemaId = "",
            rpcId = "rpc-topic"))
          resp.onCompleted()
        } else resp.onError(Status.NOT_FOUND
          .withDescription(s"topic ${req.topicName} not found")
          .asRuntimeException())
    }

  private def publishHandler =
    new ServerCalls.UnaryMethod[PublishRequest, PublishResponse] {
      override def invoke(req: PublishRequest,
                          resp: StreamObserver[PublishResponse]): Unit = {
        val ids = publishDirect(req.topicName, req.events)
        val results = req.events.zip(ids).map { case (e, rid) =>
          PublishResult(ReplayIdCodec.encode(rid), None, e.id)
        }
        resp.onNext(PublishResponse(results, schemaId = "", rpcId = "rpc-pub"))
        resp.onCompleted()
      }
    }

  /** Deliver to one subscription everything its outstanding request
    * budget covers, in ≤ `maxServerBatch` chunks. */
  private def drain(s: SubState): Unit = s.synchronized {
    if (s.dead) return
    val st = topics(s.topic)
    var continue = true
    while (continue && s.pending > 0) {
      val batch = st.synchronized {
        st.events.view.filter(_._1 > s.cursor)
          .take(math.min(s.pending, maxServerBatch)).toVector
      }
      if (batch.isEmpty) continue = false
      else {
        s.cursor = batch.last._1
        s.pending -= batch.size
        s.resp.onNext(FetchResponse(
          batch.map { case (rid, e) =>
            ConsumerEvent(e, ReplayIdCodec.encode(rid)) },
          ReplayIdCodec.encode(st.latest),
          rpcId = "rpc-sub",
          pendingNumRequested = s.pending))
      }
    }
  }

  private def drainAll(topic: String): Unit = {
    val live = subs.synchronized { subs.filter(s => !s.dead && s.topic == topic).toVector }
    live.foreach(drain)
  }

  private def subscribeHandler =
    new ServerCalls.BidiStreamingMethod[FetchRequest, FetchResponse] {
      override def invoke(resp: StreamObserver[FetchResponse]): StreamObserver[FetchRequest] =
        new StreamObserver[FetchRequest] {
          private var state: SubState = _
          override def onNext(req: FetchRequest): Unit = {
            if (state == null) {
              // first request: fixes the topic and the replay position
              topics.get(req.topicName) match {
                case None =>
                  resp.onError(Status.NOT_FOUND
                    .withDescription(s"topic ${req.topicName} not found")
                    .asRuntimeException())
                  return
                case Some(st) =>
                  val s = new SubState(req.topicName, resp)
                  req.replayPreset match {
                    case ReplayPreset.LATEST => s.cursor = st.latest
                    case ReplayPreset.EARLIEST =>
                      s.cursor = st.retentionStart - 1
                    case ReplayPreset.CUSTOM =>
                      val rid = ReplayIdCodec.decode(req.replayId)
                      if (rid < st.retentionStart - 1) {
                        resp.onError(Status.OUT_OF_RANGE
                          .withDescription(s"replay ID $rid is past retention " +
                            s"(oldest retained: ${st.retentionStart})")
                          .asRuntimeException())
                        return
                      }
                      s.cursor = rid
                    case other =>
                      resp.onError(Status.INVALID_ARGUMENT
                        .withDescription(s"unknown replay preset $other")
                        .asRuntimeException())
                      return
                  }
                  state = s
                  subs.synchronized { subs += s }
              }
            } else if (req.topicName.nonEmpty && req.topicName != state.topic) {
              // proto:404-407: a later FetchRequest naming a different
              // topic is INVALID_ARGUMENT
              state.dead = true
              resp.onError(Status.INVALID_ARGUMENT
                .withDescription(s"topic changed mid-stream: ${req.topicName}")
                .asRuntimeException())
              return
            }
            state.synchronized { state.pending += req.numRequested }
            drain(state)
          }
          override def onError(t: Throwable): Unit =
            if (state != null) state.dead = true
          override def onCompleted(): Unit = {
            if (state != null) state.dead = true
            resp.onCompleted()
          }
        }
    }

  private def managedHandler =
    new ServerCalls.BidiStreamingMethod[ManagedFetchRequest, ManagedFetchResponse] {
      override def invoke(resp: StreamObserver[ManagedFetchResponse]): StreamObserver[ManagedFetchRequest] =
        new StreamObserver[ManagedFetchRequest] {
          private var subId: String = _
          private var state: SubState = _
          // adapter so managed streams reuse drain(): wraps the managed
          // observer as a FetchResponse observer
          private def mkState(topic: String): SubState =
            new SubState(topic, new StreamObserver[FetchResponse] {
              override def onNext(v: FetchResponse): Unit =
                resp.onNext(ManagedFetchResponse(v.events, v.latestReplayId,
                  v.rpcId, v.pendingNumRequested))
              override def onError(t: Throwable): Unit = resp.onError(t)
              override def onCompleted(): Unit = resp.onCompleted()
            })
          override def onNext(req: ManagedFetchRequest): Unit = {
            if (state == null) {
              managed.get(req.subscriptionId) match {
                case None =>
                  resp.onError(Status.NOT_FOUND
                    .withDescription(
                      s"managed subscription ${req.subscriptionId} not found")
                    .asRuntimeException())
                  return
                case Some((topic, committedRid)) =>
                  subId = req.subscriptionId
                  val st = topics.getOrElseUpdate(topic, new TopicState)
                  val s = mkState(topic)
                  // resume from the server-stored commit; fresh
                  // subscriptions start at the retention floor
                  s.cursor = committedRid.getOrElse(st.retentionStart - 1L)
                  state = s
                  subs.synchronized { subs += s }
              }
            }
            req.commit.foreach { c =>
              val rid = ReplayIdCodec.decode(c.replayId)
              managed.updateWith(subId)(_.map { case (t, _) => (t, Some(rid)) })
              resp.onNext(ManagedFetchResponse(Nil,
                ReplayIdCodec.encode(topics(state.topic).latest),
                rpcId = "rpc-commit", pendingNumRequested = state.pending,
                commitResponse = Some(CommitReplayResponse(
                  c.commitRequestId, c.replayId, None,
                  processTime = System.currentTimeMillis()))))
            }
            if (req.numRequested > 0) {
              state.synchronized { state.pending += req.numRequested }
              drain(state)
            }
          }
          override def onError(t: Throwable): Unit =
            if (state != null) state.dead = true
          override def onCompleted(): Unit = {
            if (state != null) state.dead = true
            resp.onCompleted()
          }
        }
    }
}
