package graft.sources

import java.io.ByteArrayOutputStream

/** Hand-rolled protobuf3 wire codec for the Pub/Sub API message set
  * (`docs/pub-sub-api-node-client/pubsub_api.proto`) — the transport
  * schema behind [[PubSubGrpc]].
  *
  * Why hand-rolled: the environment ships no protoc and no protobuf-java
  * runtime on the compile classpath, and the message set is small and
  * frozen (a published v1 API). The proto3 wire format is a public,
  * stable spec — varint keys `(field << 3) | wireType`, wire type 0 =
  * varint, 2 = length-delimited — and these messages use nothing else
  * (no fixed32/64, no packed repeated scalars, no maps). Encoders omit
  * default values and decoders skip unknown fields, per proto3 rules, so
  * this codec interoperates byte-for-byte with any generated stub
  * speaking the same .proto (round-trip + golden-bytes pinned in
  * PubSubGrpcSpec).
  */
object PubSubProto {

  /** `ReplayPreset` (`proto:114-121`). */
  object ReplayPreset {
    val LATEST = 0
    val EARLIEST = 1
    val CUSTOM = 2
  }

  val EmptyBytes: Array[Byte] = Array.emptyByteArray

  // ---------------------------------------------------------------- model
  // One case class per proto message, field numbers in the comments.

  /** `EventHeader` (`proto:49-52`): key=1 string, value=2 bytes. */
  case class EventHeader(key: String, value: Array[Byte])

  /** `ProducerEvent` (`proto:57-66`): id=1, schema_id=2, payload=3 bytes,
    * headers=4 repeated. */
  case class ProducerEvent(id: String, schemaId: String,
                           payload: Array[Byte],
                           headers: Seq[EventHeader] = Nil)

  /** `ConsumerEvent` (`proto:72-81`): event=1 message, replay_id=2 bytes. */
  case class ConsumerEvent(event: ProducerEvent, replayId: Array[Byte])

  /** `FetchRequest` (`proto:133-159`): topic_name=1, replay_preset=2 enum,
    * replay_id=3 bytes, num_requested=4 int32. (auth_refresh=5 is
    * "internal Salesforce use only" — never set, skipped on decode.) */
  case class FetchRequest(topicName: String = "",
                          replayPreset: Int = ReplayPreset.LATEST,
                          replayId: Array[Byte] = EmptyBytes,
                          numRequested: Int = 0)

  /** `FetchResponse` (`proto:167-178`): events=1 repeated,
    * latest_replay_id=2 bytes, rpc_id=3, pending_num_requested=4. */
  case class FetchResponse(events: Seq[ConsumerEvent],
                           latestReplayId: Array[Byte],
                           rpcId: String = "",
                           pendingNumRequested: Int = 0)

  /** `SchemaRequest` (`proto:183-186`): schema_id=1. */
  case class SchemaRequest(schemaId: String)

  /** `SchemaInfo` (`proto:191-199`): schema_json=1, schema_id=2, rpc_id=3. */
  case class SchemaInfo(schemaJson: String, schemaId: String,
                        rpcId: String = "")

  /** `TopicRequest` (`proto:38-41`): topic_name=1. */
  case class TopicRequest(topicName: String)

  /** `TopicInfo` (`proto:18-33`): topic_name=1, tenant_guid=2,
    * can_publish=3 bool, can_subscribe=4 bool, schema_id=5, rpc_id=6. */
  case class TopicInfo(topicName: String, tenantGuid: String,
                       canPublish: Boolean, canSubscribe: Boolean,
                       schemaId: String, rpcId: String = "")

  /** `Error` (`proto:95-100`): code=1 enum (UNKNOWN/PUBLISH/COMMIT),
    * msg=2. */
  case class PubError(code: Int, msg: String)

  /** `PublishRequest` (`proto:201-208`): topic_name=1, events=2 repeated. */
  case class PublishRequest(topicName: String,
                            events: Seq[ProducerEvent])

  /** `PublishResult` (`proto:86-93`): replay_id=1 bytes, error=2 message,
    * correlation_key=3. */
  case class PublishResult(replayId: Array[Byte],
                           error: Option[PubError],
                           correlationKey: String)

  /** `PublishResponse` (`proto:217-224`): results=1 repeated, schema_id=2,
    * rpc_id=3. */
  case class PublishResponse(results: Seq[PublishResult],
                             schemaId: String, rpcId: String = "")

  /** `CommitReplayRequest` (`proto:289-294`): commit_request_id=1,
    * replay_id=2 bytes. */
  case class CommitReplayRequest(commitRequestId: String,
                                 replayId: Array[Byte])

  /** `CommitReplayResponse` (`proto:304-315`): commit_request_id=1,
    * replay_id=2, error=3 message, process_time=4 int64. */
  case class CommitReplayResponse(commitRequestId: String,
                                  replayId: Array[Byte],
                                  error: Option[PubError],
                                  processTime: Long)

  /** `ManagedFetchRequest` (`proto:236-256`): subscription_id=1,
    * developer_name=2, num_requested=3, commit_replay_id_request=5. */
  case class ManagedFetchRequest(subscriptionId: String = "",
                                 developerName: String = "",
                                 numRequested: Int = 0,
                                 commit: Option[CommitReplayRequest] = None)

  /** `ManagedFetchResponse` (`proto:264-276`): events=1 repeated,
    * latest_replay_id=2, rpc_id=3, pending_num_requested=4,
    * commit_response=5. */
  case class ManagedFetchResponse(events: Seq[ConsumerEvent],
                                  latestReplayId: Array[Byte],
                                  rpcId: String = "",
                                  pendingNumRequested: Int = 0,
                                  commitResponse: Option[CommitReplayResponse] = None)

  // ------------------------------------------------------- wire primitives

  /** Append-only proto3 writer. Encoders call `str`/`bytes`/`int32`/... ;
    * each omits the field entirely at its proto3 default, per spec.
    */
  final class Writer {
    private val out = new ByteArrayOutputStream(64)

    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) {
        out.write(((v & 0x7f) | 0x80).toInt)
        v >>>= 7
      }
      out.write(v.toInt)
    }
    private def key(field: Int, wireType: Int): Unit =
      varint(((field.toLong) << 3) | wireType)

    def str(field: Int, s: String): Unit =
      if (s != null && s.nonEmpty) bytes(field, s.getBytes("UTF-8"))
    def bytes(field: Int, b: Array[Byte]): Unit =
      if (b != null && b.nonEmpty) { key(field, 2); varint(b.length); out.write(b, 0, b.length) }
    def int32(field: Int, v: Int): Unit =
      if (v != 0) { key(field, 0); varint(v.toLong) } // int32 sign-extends to 10 bytes; these fields are never negative but the encode is still spec-exact via the Long path
    def int64(field: Int, v: Long): Unit =
      if (v != 0L) { key(field, 0); varint(v) }
    def bool(field: Int, v: Boolean): Unit =
      if (v) { key(field, 0); varint(1L) }
    /** Embedded message — ALWAYS emitted when the caller passes one
      * (presence of a message field is meaningful in proto3). */
    def msg(field: Int, body: Array[Byte]): Unit = {
      key(field, 2); varint(body.length); out.write(body, 0, body.length)
    }
    def result(): Array[Byte] = out.toByteArray
  }

  /** Forward-only proto3 reader with unknown-field skip. */
  final class Reader(buf: Array[Byte]) {
    private var pos = 0
    def hasNext: Boolean = pos < buf.length

    def varint(): Long = {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        require(pos < buf.length, "truncated varint")
        b = buf(pos) & 0xff
        pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0 && shift < 70)
      v
    }
    /** Returns (fieldNumber, wireType). */
    def readKey(): (Int, Int) = {
      val k = varint()
      ((k >>> 3).toInt, (k & 7).toInt)
    }
    def lenDelim(): Array[Byte] = {
      val n = varint().toInt
      require(n >= 0 && pos + n <= buf.length, "truncated length-delimited field")
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      r
    }
    def strField(): String = new String(lenDelim(), "UTF-8")
    /** Skip an unknown field of the given wire type (proto3 rule). */
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val n = varint().toInt; pos += n
      case 5 => pos += 4
      case wt => throw new IllegalArgumentException(s"unsupported wire type $wt")
    }
  }

  // ------------------------------------------------------------- encoders

  def encodeEventHeader(h: EventHeader): Array[Byte] = {
    val w = new Writer; w.str(1, h.key); w.bytes(2, h.value); w.result()
  }
  def encodeProducerEvent(e: ProducerEvent): Array[Byte] = {
    val w = new Writer
    w.str(1, e.id); w.str(2, e.schemaId); w.bytes(3, e.payload)
    e.headers.foreach(h => w.msg(4, encodeEventHeader(h)))
    w.result()
  }
  def encodeConsumerEvent(e: ConsumerEvent): Array[Byte] = {
    val w = new Writer
    w.msg(1, encodeProducerEvent(e.event)); w.bytes(2, e.replayId)
    w.result()
  }
  def encodeFetchRequest(r: FetchRequest): Array[Byte] = {
    val w = new Writer
    w.str(1, r.topicName); w.int32(2, r.replayPreset)
    w.bytes(3, r.replayId); w.int32(4, r.numRequested)
    w.result()
  }
  def encodeFetchResponse(r: FetchResponse): Array[Byte] = {
    val w = new Writer
    r.events.foreach(e => w.msg(1, encodeConsumerEvent(e)))
    w.bytes(2, r.latestReplayId); w.str(3, r.rpcId)
    w.int32(4, r.pendingNumRequested)
    w.result()
  }
  def encodeSchemaRequest(r: SchemaRequest): Array[Byte] = {
    val w = new Writer; w.str(1, r.schemaId); w.result()
  }
  def encodeSchemaInfo(r: SchemaInfo): Array[Byte] = {
    val w = new Writer
    w.str(1, r.schemaJson); w.str(2, r.schemaId); w.str(3, r.rpcId)
    w.result()
  }
  def encodeTopicRequest(r: TopicRequest): Array[Byte] = {
    val w = new Writer; w.str(1, r.topicName); w.result()
  }
  def encodeTopicInfo(r: TopicInfo): Array[Byte] = {
    val w = new Writer
    w.str(1, r.topicName); w.str(2, r.tenantGuid)
    w.bool(3, r.canPublish); w.bool(4, r.canSubscribe)
    w.str(5, r.schemaId); w.str(6, r.rpcId)
    w.result()
  }
  def encodePubError(e: PubError): Array[Byte] = {
    val w = new Writer; w.int32(1, e.code); w.str(2, e.msg); w.result()
  }
  def encodePublishRequest(r: PublishRequest): Array[Byte] = {
    val w = new Writer
    w.str(1, r.topicName)
    r.events.foreach(e => w.msg(2, encodeProducerEvent(e)))
    w.result()
  }
  def encodePublishResult(r: PublishResult): Array[Byte] = {
    val w = new Writer
    w.bytes(1, r.replayId)
    r.error.foreach(e => w.msg(2, encodePubError(e)))
    w.str(3, r.correlationKey)
    w.result()
  }
  def encodePublishResponse(r: PublishResponse): Array[Byte] = {
    val w = new Writer
    r.results.foreach(x => w.msg(1, encodePublishResult(x)))
    w.str(2, r.schemaId); w.str(3, r.rpcId)
    w.result()
  }
  def encodeCommitReplayRequest(r: CommitReplayRequest): Array[Byte] = {
    val w = new Writer
    w.str(1, r.commitRequestId); w.bytes(2, r.replayId)
    w.result()
  }
  def encodeCommitReplayResponse(r: CommitReplayResponse): Array[Byte] = {
    val w = new Writer
    w.str(1, r.commitRequestId); w.bytes(2, r.replayId)
    r.error.foreach(e => w.msg(3, encodePubError(e)))
    w.int64(4, r.processTime)
    w.result()
  }
  def encodeManagedFetchRequest(r: ManagedFetchRequest): Array[Byte] = {
    val w = new Writer
    w.str(1, r.subscriptionId); w.str(2, r.developerName)
    w.int32(3, r.numRequested)
    r.commit.foreach(c => w.msg(5, encodeCommitReplayRequest(c)))
    w.result()
  }
  def encodeManagedFetchResponse(r: ManagedFetchResponse): Array[Byte] = {
    val w = new Writer
    r.events.foreach(e => w.msg(1, encodeConsumerEvent(e)))
    w.bytes(2, r.latestReplayId); w.str(3, r.rpcId)
    w.int32(4, r.pendingNumRequested)
    r.commitResponse.foreach(c => w.msg(5, encodeCommitReplayResponse(c)))
    w.result()
  }

  // ------------------------------------------------------------- decoders

  def decodeEventHeader(b: Array[Byte]): EventHeader = {
    val r = new Reader(b)
    var key = ""; var value = EmptyBytes
    while (r.hasNext) r.readKey() match {
      case (1, 2) => key = r.strField()
      case (2, 2) => value = r.lenDelim()
      case (_, wt) => r.skip(wt)
    }
    EventHeader(key, value)
  }
  def decodeProducerEvent(b: Array[Byte]): ProducerEvent = {
    val r = new Reader(b)
    var id = ""; var schemaId = ""; var payload = EmptyBytes
    val headers = Seq.newBuilder[EventHeader]
    while (r.hasNext) r.readKey() match {
      case (1, 2) => id = r.strField()
      case (2, 2) => schemaId = r.strField()
      case (3, 2) => payload = r.lenDelim()
      case (4, 2) => headers += decodeEventHeader(r.lenDelim())
      case (_, wt) => r.skip(wt)
    }
    ProducerEvent(id, schemaId, payload, headers.result())
  }
  def decodeConsumerEvent(b: Array[Byte]): ConsumerEvent = {
    val r = new Reader(b)
    var event = ProducerEvent("", "", EmptyBytes)
    var replayId = EmptyBytes
    while (r.hasNext) r.readKey() match {
      case (1, 2) => event = decodeProducerEvent(r.lenDelim())
      case (2, 2) => replayId = r.lenDelim()
      case (_, wt) => r.skip(wt)
    }
    ConsumerEvent(event, replayId)
  }
  def decodeFetchRequest(b: Array[Byte]): FetchRequest = {
    val r = new Reader(b)
    var req = FetchRequest()
    while (r.hasNext) r.readKey() match {
      case (1, 2) => req = req.copy(topicName = r.strField())
      case (2, 0) => req = req.copy(replayPreset = r.varint().toInt)
      case (3, 2) => req = req.copy(replayId = r.lenDelim())
      case (4, 0) => req = req.copy(numRequested = r.varint().toInt)
      case (_, wt) => r.skip(wt)
    }
    req
  }
  def decodeFetchResponse(b: Array[Byte]): FetchResponse = {
    val r = new Reader(b)
    val events = Seq.newBuilder[ConsumerEvent]
    var latest = EmptyBytes; var rpcId = ""; var pending = 0
    while (r.hasNext) r.readKey() match {
      case (1, 2) => events += decodeConsumerEvent(r.lenDelim())
      case (2, 2) => latest = r.lenDelim()
      case (3, 2) => rpcId = r.strField()
      case (4, 0) => pending = r.varint().toInt
      case (_, wt) => r.skip(wt)
    }
    FetchResponse(events.result(), latest, rpcId, pending)
  }
  def decodeSchemaRequest(b: Array[Byte]): SchemaRequest = {
    val r = new Reader(b)
    var id = ""
    while (r.hasNext) r.readKey() match {
      case (1, 2) => id = r.strField()
      case (_, wt) => r.skip(wt)
    }
    SchemaRequest(id)
  }
  def decodeSchemaInfo(b: Array[Byte]): SchemaInfo = {
    val r = new Reader(b)
    var json = ""; var id = ""; var rpcId = ""
    while (r.hasNext) r.readKey() match {
      case (1, 2) => json = r.strField()
      case (2, 2) => id = r.strField()
      case (3, 2) => rpcId = r.strField()
      case (_, wt) => r.skip(wt)
    }
    SchemaInfo(json, id, rpcId)
  }
  def decodeTopicRequest(b: Array[Byte]): TopicRequest = {
    val r = new Reader(b)
    var t = ""
    while (r.hasNext) r.readKey() match {
      case (1, 2) => t = r.strField()
      case (_, wt) => r.skip(wt)
    }
    TopicRequest(t)
  }
  def decodeTopicInfo(b: Array[Byte]): TopicInfo = {
    val r = new Reader(b)
    var name = ""; var guid = ""; var pub = false; var sub = false
    var schemaId = ""; var rpcId = ""
    while (r.hasNext) r.readKey() match {
      case (1, 2) => name = r.strField()
      case (2, 2) => guid = r.strField()
      case (3, 0) => pub = r.varint() != 0L
      case (4, 0) => sub = r.varint() != 0L
      case (5, 2) => schemaId = r.strField()
      case (6, 2) => rpcId = r.strField()
      case (_, wt) => r.skip(wt)
    }
    TopicInfo(name, guid, pub, sub, schemaId, rpcId)
  }
  def decodePubError(b: Array[Byte]): PubError = {
    val r = new Reader(b)
    var code = 0; var msg = ""
    while (r.hasNext) r.readKey() match {
      case (1, 0) => code = r.varint().toInt
      case (2, 2) => msg = r.strField()
      case (_, wt) => r.skip(wt)
    }
    PubError(code, msg)
  }
  def decodePublishRequest(b: Array[Byte]): PublishRequest = {
    val r = new Reader(b)
    var topic = ""
    val events = Seq.newBuilder[ProducerEvent]
    while (r.hasNext) r.readKey() match {
      case (1, 2) => topic = r.strField()
      case (2, 2) => events += decodeProducerEvent(r.lenDelim())
      case (_, wt) => r.skip(wt)
    }
    PublishRequest(topic, events.result())
  }
  def decodePublishResult(b: Array[Byte]): PublishResult = {
    val r = new Reader(b)
    var replay = EmptyBytes; var err: Option[PubError] = None; var ck = ""
    while (r.hasNext) r.readKey() match {
      case (1, 2) => replay = r.lenDelim()
      case (2, 2) => err = Some(decodePubError(r.lenDelim()))
      case (3, 2) => ck = r.strField()
      case (_, wt) => r.skip(wt)
    }
    PublishResult(replay, err, ck)
  }
  def decodePublishResponse(b: Array[Byte]): PublishResponse = {
    val r = new Reader(b)
    val results = Seq.newBuilder[PublishResult]
    var schemaId = ""; var rpcId = ""
    while (r.hasNext) r.readKey() match {
      case (1, 2) => results += decodePublishResult(r.lenDelim())
      case (2, 2) => schemaId = r.strField()
      case (3, 2) => rpcId = r.strField()
      case (_, wt) => r.skip(wt)
    }
    PublishResponse(results.result(), schemaId, rpcId)
  }
  def decodeCommitReplayRequest(b: Array[Byte]): CommitReplayRequest = {
    val r = new Reader(b)
    var id = ""; var replay = EmptyBytes
    while (r.hasNext) r.readKey() match {
      case (1, 2) => id = r.strField()
      case (2, 2) => replay = r.lenDelim()
      case (_, wt) => r.skip(wt)
    }
    CommitReplayRequest(id, replay)
  }
  def decodeCommitReplayResponse(b: Array[Byte]): CommitReplayResponse = {
    val r = new Reader(b)
    var id = ""; var replay = EmptyBytes
    var err: Option[PubError] = None; var pt = 0L
    while (r.hasNext) r.readKey() match {
      case (1, 2) => id = r.strField()
      case (2, 2) => replay = r.lenDelim()
      case (3, 2) => err = Some(decodePubError(r.lenDelim()))
      case (4, 0) => pt = r.varint()
      case (_, wt) => r.skip(wt)
    }
    CommitReplayResponse(id, replay, err, pt)
  }
  def decodeManagedFetchRequest(b: Array[Byte]): ManagedFetchRequest = {
    val r = new Reader(b)
    var req = ManagedFetchRequest()
    while (r.hasNext) r.readKey() match {
      case (1, 2) => req = req.copy(subscriptionId = r.strField())
      case (2, 2) => req = req.copy(developerName = r.strField())
      case (3, 0) => req = req.copy(numRequested = r.varint().toInt)
      case (5, 2) => req = req.copy(commit = Some(decodeCommitReplayRequest(r.lenDelim())))
      case (_, wt) => r.skip(wt)
    }
    req
  }
  def decodeManagedFetchResponse(b: Array[Byte]): ManagedFetchResponse = {
    val r = new Reader(b)
    val events = Seq.newBuilder[ConsumerEvent]
    var latest = EmptyBytes; var rpcId = ""; var pending = 0
    var commit: Option[CommitReplayResponse] = None
    while (r.hasNext) r.readKey() match {
      case (1, 2) => events += decodeConsumerEvent(r.lenDelim())
      case (2, 2) => latest = r.lenDelim()
      case (3, 2) => rpcId = r.strField()
      case (4, 0) => pending = r.varint().toInt
      case (5, 2) => commit = Some(decodeCommitReplayResponse(r.lenDelim()))
      case (_, wt) => r.skip(wt)
    }
    ManagedFetchResponse(events.result(), latest, rpcId, pending, commit)
  }
}
