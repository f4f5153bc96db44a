package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import org.sparkproject.connect.grpc.{CallCredentials, CallOptions, Channel, Metadata, MethodDescriptor, Status, StatusRuntimeException}
import org.sparkproject.connect.grpc.stub.{ClientCalls, StreamObserver}

import graft.functions.ReplayIdCodec
import graft.sources.PubSubProto._

/** gRPC transport binding for the Pub/Sub `Subscribe` surface — the thin
  * wire shim the README SEAMS table specifies, built on the grpc-java
  * runtime the Spark distribution already ships (shaded under
  * `org.sparkproject.connect.grpc.*`, a repackaging of the public
  * `io.grpc` API: against a standalone grpc-java dependency ONLY the
  * import prefix changes — every call below is verbatim grpc-java usage).
  *
  * What lives here:
  *  - [[PubSubGrpc]]: the five `eventbus.v1.PubSub` method descriptors
  *    (`proto:335-417`) over the [[PubSubProto]] codec;
  *  - [[PubSubGrpc.authCallCredentials]]: the per-call auth metadata the
  *    reference attaches (`client.js:160-174` — `accesstoken` /
  *    `instanceurl` / `tenantid` from the [[Auth]] flow);
  *  - [[PubSubClient]]: the subscribe loop with the reference's flow
  *    control (`client.js:265-338, 816-845`: request N, count received,
  *    re-request N when the batch is consumed), keepalive consumption
  *    (`client.js:846-857`), CUSTOM/EARLIEST/LATEST positioning, managed
  *    subscriptions with `CommitReplayRequest` (`client.js:515-541`),
  *    and `GetSchema` in the exact shape [[SchemaRegistry]]'s `fetch`
  *    expects;
  *  - [[ChangeEventLogWriter]]: the bridge that lands each
  *    `FetchResponse` batch as one `events-<maxReplayId>-n<rows>.jsonl`
  *    file, so the DSv2 [[ChangeEventLog]] source — and everything
  *    downstream: decode, fold, publish, forward — runs unchanged on
  *    wire-fed data.
  *
  * Scale shape: the subscribe loop is a DRIVER-side pump (one thread, one
  * gRPC stream — exactly the reference worker's shape and throughput
  * envelope); Spark parallelism starts at the log the pump writes, where
  * [[ChangeEventLogStream]] splits files into byte ranges. Fan-out at
  * 100 TB is by TOPIC (one pump per topic; the reference runs one worker
  * per subscription), never by splitting one gRPC stream.
  */
object PubSubGrpc {

  /** The reference's client-side batch cap (`client.js:49`): an infinite
    * subscription requests events in batches of this size. */
  val MaxEventBatchSize = 100

  private def marshaller[T <: AnyRef](enc: T => Array[Byte],
                                      dec: Array[Byte] => T) =
    new MethodDescriptor.Marshaller[T] {
      override def stream(value: T): InputStream =
        new ByteArrayInputStream(enc(value))
      override def parse(stream: InputStream): T = dec(stream.readAllBytes())
    }

  private def method[Req <: AnyRef, Resp <: AnyRef](
      name: String, kind: MethodDescriptor.MethodType,
      reqEnc: Req => Array[Byte], reqDec: Array[Byte] => Req,
      respEnc: Resp => Array[Byte], respDec: Array[Byte] => Resp) =
    MethodDescriptor.newBuilder[Req, Resp]()
      .setType(kind)
      .setFullMethodName(
        MethodDescriptor.generateFullMethodName("eventbus.v1.PubSub", name))
      .setRequestMarshaller(marshaller(reqEnc, reqDec))
      .setResponseMarshaller(marshaller(respEnc, respDec))
      .build()

  /** `rpc Subscribe (stream FetchRequest) returns (stream FetchResponse)` */
  val SubscribeMethod: MethodDescriptor[FetchRequest, FetchResponse] =
    method("Subscribe", MethodDescriptor.MethodType.BIDI_STREAMING,
      encodeFetchRequest, decodeFetchRequest,
      encodeFetchResponse, decodeFetchResponse)

  /** `rpc GetSchema (SchemaRequest) returns (SchemaInfo)` */
  val GetSchemaMethod: MethodDescriptor[SchemaRequest, SchemaInfo] =
    method("GetSchema", MethodDescriptor.MethodType.UNARY,
      encodeSchemaRequest, decodeSchemaRequest,
      encodeSchemaInfo, decodeSchemaInfo)

  /** `rpc GetTopic (TopicRequest) returns (TopicInfo)` */
  val GetTopicMethod: MethodDescriptor[TopicRequest, TopicInfo] =
    method("GetTopic", MethodDescriptor.MethodType.UNARY,
      encodeTopicRequest, decodeTopicRequest,
      encodeTopicInfo, decodeTopicInfo)

  /** `rpc Publish (PublishRequest) returns (PublishResponse)` */
  val PublishMethod: MethodDescriptor[PublishRequest, PublishResponse] =
    method("Publish", MethodDescriptor.MethodType.UNARY,
      encodePublishRequest, decodePublishRequest,
      encodePublishResponse, decodePublishResponse)

  /** `rpc ManagedSubscribe (stream ManagedFetchRequest) returns (stream
    * ManagedFetchResponse)` */
  val ManagedSubscribeMethod: MethodDescriptor[ManagedFetchRequest, ManagedFetchResponse] =
    method("ManagedSubscribe", MethodDescriptor.MethodType.BIDI_STREAMING,
      encodeManagedFetchRequest, decodeManagedFetchRequest,
      encodeManagedFetchResponse, decodeManagedFetchResponse)

  /** The three auth metadata keys every RPC carries (`proto:330-333`,
    * `client.js:160-174`). */
  val AccessTokenKey: Metadata.Key[String] =
    Metadata.Key.of("accesstoken", Metadata.ASCII_STRING_MARSHALLER)
  val InstanceUrlKey: Metadata.Key[String] =
    Metadata.Key.of("instanceurl", Metadata.ASCII_STRING_MARSHALLER)
  val TenantIdKey: Metadata.Key[String] =
    Metadata.Key.of("tenantid", Metadata.ASCII_STRING_MARSHALLER)

  /** Per-call credentials attaching the session triple — the grpc-java
    * rendering of the reference's `metaCallback` +
    * `createFromMetadataGenerator` (`client.js:160-176`). In production
    * these combine with TLS channel credentials
    * (`combineChannelCredentials`); the in-process spec channel provides
    * the transport-security level itself.
    */
  def authCallCredentials(accessToken: String, instanceUrl: String,
                          tenantId: String): CallCredentials =
    new CallCredentials {
      override def applyRequestMetadata(
          requestInfo: CallCredentials.RequestInfo,
          appExecutor: java.util.concurrent.Executor,
          applier: CallCredentials.MetadataApplier): Unit = {
        val md = new Metadata()
        md.put(AccessTokenKey, accessToken)
        md.put(InstanceUrlKey, instanceUrl)
        md.put(TenantIdKey, tenantId)
        applier.apply(md)
      }
    }
}

/** What a subscription feeds. Mirrors the reference's
  * `SubscribeCallbackType` dispatch (`client.js:746-888`): EVENT batches,
  * GRPC_KEEP_ALIVE ticks, ERROR, END.
  */
trait SubscribeHandler {
  /** A non-empty `FetchResponse`: decoded events + the server's latest
    * replay ID. */
  def onEvents(events: Seq[ConsumerEvent], latestReplayId: Long): Unit
  /** An EMPTY `FetchResponse` — the ≤270 s keepalive (`proto:164-166`):
    * advances the latest-known replay ID, emits no rows. */
  def onKeepalive(latestReplayId: Long, pendingNumRequested: Int): Unit = ()
  /** Stream error. `status.getCode == OUT_OF_RANGE` is the
    * replay-ID-past-retention signal — route it to the snapshot resync
    * hook ([[graft.streaming.Bootstrap.snapshotThenStream]]), the
    * reference's recovery path (`setup.md:306`). */
  def onError(status: Status): Unit = ()
  /** Orderly server end-of-stream. */
  def onEnd(): Unit = ()
}

/** Handle on a live subscription: flow-control introspection + the
  * client-side writes the reference exposes (`requestAdditionalEvents`,
  * managed `commitReplayId`). */
final class SubscriptionHandle[Req](
    requests: StreamObserver[Req],
    mkTopUp: Int => Req,
    mkCommit: (String, Array[Byte]) => Req) {
  private[sources] val receivedCount = new AtomicLong(0)
  private[sources] val requestedCount = new AtomicLong(0)
  private[sources] val lastReplayIdRef = new AtomicLong(-1L)
  @volatile private[sources] var closed = false

  /** Events received since the last top-up (reference
    * `info.receivedEventCount`). */
  def received: Long = receivedCount.get()
  /** The resume cursor: for EVENT batches, the latest replay ID whose
    * batch the handler LANDED (advanced only after `onEvents` returns —
    * a handler throw leaves the cursor at the previous batch, so a
    * supervisor resuming CUSTOM from here never skips unpersisted
    * events); for keepalives, the latest seen on the wire (no
    * persistence involved). -1 before any response. NOT "latest seen on
    * the wire" for events — a stuck writer holds this at the last landed
    * batch by design. */
  def lastReplayId: Long = lastReplayIdRef.get()

  /** `requestAdditionalEvents` (`client.js:455-477`): reset the received
    * counter and ask for `n` more. */
  def requestAdditionalEvents(n: Int): Unit = synchronized {
    if (!closed) {
      receivedCount.set(0)
      requestedCount.set(n)
      requests.onNext(mkTopUp(n))
    }
  }

  /** Managed-subscription replay commit (`client.js:515-541`): returns
    * the generated `commitRequestId` to match the eventual
    * `CommitReplayResponse`. Only valid on managed subscriptions. */
  def commitReplayId(replayId: Long): String = synchronized {
    require(mkCommit != null, "commitReplayId requires a managed subscription")
    val id = java.util.UUID.randomUUID().toString
    if (!closed) requests.onNext(mkCommit(id, ReplayIdCodec.encode(replayId)))
    id
  }

  /** Half-close the client side of the stream. */
  def close(): Unit = synchronized {
    if (!closed) { closed = true; requests.onCompleted() }
  }
}

/** The reference client's surface over a connected channel. One instance
  * per (channel, auth) pair; every RPC carries the auth metadata via
  * [[PubSubGrpc.authCallCredentials]].
  */
class PubSubClient(channel: Channel, creds: CallCredentials) {
  import PubSubGrpc._

  private def callOptions = CallOptions.DEFAULT.withCallCredentials(creds)

  /** `GetSchema`, blocking — in exactly the `fetch` shape
    * [[SchemaRegistry]] wants: NOT_FOUND becomes the typed
    * [[SchemaNotFoundException]] (dead-letter routing), any other status
    * propagates (transient → the registry's retry loop). */
  def getSchema(schemaId: String): String =
    try ClientCalls.blockingUnaryCall(channel, GetSchemaMethod, callOptions,
      SchemaRequest(schemaId)).schemaJson
    catch {
      case e: StatusRuntimeException
          if e.getStatus.getCode == Status.Code.NOT_FOUND =>
        throw new SchemaNotFoundException(schemaId)
    }

  /** A [[SchemaRegistry]] wired to this transport — S4 end-to-end. */
  def schemaRegistry(): SchemaRegistry = new SchemaRegistry(getSchema)

  /** `GetTopic`, blocking. */
  def getTopic(topicName: String): TopicInfo =
    ClientCalls.blockingUnaryCall(channel, GetTopicMethod, callOptions,
      TopicRequest(topicName))

  /** Synchronous `Publish` of a pre-encoded event batch. */
  def publish(topicName: String, events: Seq[ProducerEvent]): PublishResponse =
    ClientCalls.blockingUnaryCall(channel, PublishMethod, callOptions,
      PublishRequest(topicName, events))

  /** Open the `Subscribe` bidi stream (`client.js:265-338`).
    *
    * `numRequested = None` is the reference's infinite mode: request
    * [[PubSubGrpc.MaxEventBatchSize]], and each time the requested count
    * has been received, immediately re-request the same amount
    * (`client.js:816-845`) — the pull-based flow control the proto
    * documents. A finite `Some(n)` requests exactly n and then stops
    * (the reference's LAST_EVENT behavior).
    */
  def subscribe(topicName: String, handler: SubscribeHandler,
                replayPreset: Int = ReplayPreset.LATEST,
                replayId: Option[Long] = None,
                numRequested: Option[Int] = None): SubscriptionHandle[FetchRequest] = {
    require(replayPreset != ReplayPreset.CUSTOM || replayId.isDefined,
      "CUSTOM replay preset needs a replayId")
    val firstRequest = numRequested.getOrElse(MaxEventBatchSize)
    val infinite = numRequested.isEmpty

    val call = channel.newCall(SubscribeMethod, callOptions)
    // The response observer can fire BEFORE asyncBidiStreamingCall
    // returns the request stream the handle wraps (an immediate
    // UNAUTHENTICATED close lands onError on the channel executor while
    // this thread is still between the two statements) — so callbacks
    // wait on the ready latch instead of reading a maybe-null var. On a
    // pooled channel executor (the default) the await is momentary; on a
    // directExecutor channel the callback would run ON the constructing
    // thread and the await could never be satisfied — the timed await
    // turns that misconfiguration into a loud failure, not a deadlock.
    var handle: SubscriptionHandle[FetchRequest] = null
    val ready = new java.util.concurrent.CountDownLatch(1)
    def h: SubscriptionHandle[FetchRequest] = {
      if (!ready.await(60, java.util.concurrent.TimeUnit.SECONDS))
        throw new IllegalStateException(
          "subscription callback before the handle was ready for 60s — " +
            "is the channel using directExecutor()? Use a pooled executor.")
      handle
    }
    val requests = ClientCalls.asyncBidiStreamingCall(call,
      new StreamObserver[FetchResponse] {
        override def onNext(resp: FetchResponse): Unit = {
          val latest = ReplayIdCodec.decode(resp.latestReplayId)
          if (resp.events.nonEmpty) {
            handler.onEvents(resp.events, latest)
            // advance the resume cursor only AFTER the handler landed the
            // batch: a handler throw cancels the stream, and an in-process
            // supervisor (PubSubConnect.supervise) resumes CUSTOM from
            // this ref — set before the handler, a writer failure would
            // permanently skip the batch it failed to persist
            h.lastReplayIdRef.set(latest)
            val got = h.receivedCount.addAndGet(resp.events.size)
            // reached the last requested event -> in infinite mode,
            // request the next batch (client.js:816-845)
            if (got >= h.requestedCount.get() && infinite)
              h.requestAdditionalEvents(MaxEventBatchSize)
          } else {
            // keepalives involve no persistence — safe to advance first
            h.lastReplayIdRef.set(latest)
            handler.onKeepalive(latest, resp.pendingNumRequested)
          }
        }
        override def onError(t: Throwable): Unit = {
          h.closed = true
          handler.onError(Status.fromThrowable(t))
        }
        override def onCompleted(): Unit = {
          h.closed = true
          handler.onEnd()
        }
      })
    handle = new SubscriptionHandle[FetchRequest](requests,
      n => FetchRequest(topicName = topicName, numRequested = n),
      mkCommit = null)
    handle.requestedCount.set(firstRequest)
    ready.countDown()
    requests.onNext(FetchRequest(
      topicName = topicName,
      replayPreset = replayPreset,
      replayId = replayId.map(ReplayIdCodec.encode).getOrElse(EmptyBytes),
      numRequested = firstRequest))
    handle
  }

  /** `ManagedSubscribe` (`client.js:352-448`): server-tracked commit
    * state; the handle's `commitReplayId` sends `CommitReplayRequest`s
    * and `onCommitResponse` receives the (possibly batched) acks. */
  def managedSubscribe(subscriptionId: String, handler: SubscribeHandler,
                       numRequested: Option[Int] = None,
                       onCommitResponse: CommitReplayResponse => Unit = _ => ())
      : SubscriptionHandle[ManagedFetchRequest] = {
    val firstRequest = numRequested.getOrElse(MaxEventBatchSize)
    val infinite = numRequested.isEmpty
    val call = channel.newCall(ManagedSubscribeMethod, callOptions)
    // same handle-ready latch as subscribe(): callbacks can beat the
    // handle assignment when the server closes the stream immediately,
    // and the timed await fails loud on a directExecutor channel
    var handle: SubscriptionHandle[ManagedFetchRequest] = null
    val ready = new java.util.concurrent.CountDownLatch(1)
    def h: SubscriptionHandle[ManagedFetchRequest] = {
      if (!ready.await(60, java.util.concurrent.TimeUnit.SECONDS))
        throw new IllegalStateException(
          "subscription callback before the handle was ready for 60s — " +
            "is the channel using directExecutor()? Use a pooled executor.")
      handle
    }
    val requests = ClientCalls.asyncBidiStreamingCall(call,
      new StreamObserver[ManagedFetchResponse] {
        override def onNext(resp: ManagedFetchResponse): Unit = {
          val latest =
            if (resp.latestReplayId.nonEmpty)
              ReplayIdCodec.decode(resp.latestReplayId)
            else h.lastReplayIdRef.get()
          resp.commitResponse.foreach(onCommitResponse)
          if (resp.events.nonEmpty) {
            handler.onEvents(resp.events, latest)
            // post-handler, like the Subscribe path: the resume cursor
            // must never run ahead of what the handler persisted
            h.lastReplayIdRef.set(latest)
            val got = h.receivedCount.addAndGet(resp.events.size)
            if (got >= h.requestedCount.get() && infinite)
              h.requestAdditionalEvents(PubSubGrpc.MaxEventBatchSize)
          } else {
            h.lastReplayIdRef.set(latest)
            if (resp.commitResponse.isEmpty)
              handler.onKeepalive(latest, resp.pendingNumRequested)
          }
        }
        override def onError(t: Throwable): Unit = {
          h.closed = true
          handler.onError(Status.fromThrowable(t))
        }
        override def onCompleted(): Unit = {
          h.closed = true
          handler.onEnd()
        }
      })
    handle = new SubscriptionHandle[ManagedFetchRequest](requests,
      n => ManagedFetchRequest(subscriptionId = subscriptionId, numRequested = n),
      (id, rid) => ManagedFetchRequest(subscriptionId = subscriptionId,
        commit = Some(CommitReplayRequest(id, rid))))
    handle.requestedCount.set(firstRequest)
    ready.countDown()
    requests.onNext(ManagedFetchRequest(subscriptionId = subscriptionId,
      numRequested = firstRequest))
    handle
  }
}

/** Lands wire batches in a [[ChangeEventLog]] directory: each
  * `FetchResponse`'s events become ONE atomically-renamed
  * `events-<maxReplayId>-n<rows>.jsonl` file, the exact layout the DSv2
  * source's pure-listing offset math and row-accurate admission expect.
  *
  * Envelope mapping (FIXTURES A.1 over `ProducerEvent`, `proto:57-80`):
  * `replayId` = big-endian-decoded `replay_id`; `sfId` = `event.id`;
  * `changeType` comes from the `changetype` event header when present
  * (the CDC ChangeEventHeader rides inside the Avro payload — the
  * header is the transport-visible copy); `schemaId` = `event.schema_id`;
  * `data` = base64 of the Avro `payload` (JSONL is a text container);
  * `headers` = the remaining event headers, UTF-8 values.
  */
final class ChangeEventLogWriter(logDir: String) extends SubscribeHandler {
  private val dir = java.nio.file.Paths.get(logDir)
  java.nio.file.Files.createDirectories(dir)
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  @volatile private var latestSeen: Long = -1L

  /** Latest replay ID observed on the wire (events OR keepalives) — the
    * staleness watchdog input. */
  def latestReplayId: Long = latestSeen

  override def onEvents(events: Seq[ConsumerEvent], latest: Long): Unit = {
    latestSeen = math.max(latestSeen, latest)
    if (events.isEmpty) return
    val sb = new StringBuilder()
    var maxRid = Long.MinValue
    events.foreach { ce =>
      val rid = ReplayIdCodec.decode(ce.replayId)
      maxRid = math.max(maxRid, rid)
      val node = mapper.createObjectNode()
      node.put("replayId", rid)
      node.put("sfId", ce.event.id)
      val (ctHeaders, rest) = ce.event.headers.partition(_.key == "changetype")
      ctHeaders.headOption.foreach(h =>
        node.put("changeType", new String(h.value, StandardCharsets.UTF_8)))
      if (ce.event.schemaId.nonEmpty) node.put("schemaId", ce.event.schemaId)
      node.put("data",
        java.util.Base64.getEncoder.encodeToString(ce.event.payload))
      if (rest.nonEmpty) {
        val arr = node.putArray("headers")
        rest.foreach { h =>
          val o = arr.addObject()
          o.put("key", h.key)
          o.put("value", new String(h.value, StandardCharsets.UTF_8))
        }
      }
      sb.append(mapper.writeValueAsString(node)).append('\n')
    }
    // write-then-rename: the DSv2 source lists `events-*.jsonl` only, so a
    // half-written temp file is never visible as log content
    val name = s"events-$maxRid-n${events.size}.jsonl"
    val tmp = dir.resolve(s".$name.tmp")
    java.nio.file.Files.write(tmp, sb.toString.getBytes(StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, dir.resolve(name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  override def onKeepalive(latest: Long, pending: Int): Unit =
    latestSeen = math.max(latestSeen, latest)
}
