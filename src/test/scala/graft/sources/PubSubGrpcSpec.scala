package graft.sources

import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.sparkproject.connect.grpc.{ManagedChannel, Status, StatusRuntimeException}
import org.sparkproject.connect.grpc.inprocess.InProcessChannelBuilder

import graft.SparkSpec
import graft.functions.ReplayIdCodec
import graft.sources.PubSubProto._

/** The gRPC transport seam, specced against an in-process grpc-java
  * server ([[PubSubTestServer]]) — each test closes one row of the README
  * SEAMS parity table: auth metadata (`client.js:160-174`), subscribe
  * flow control with batch-cap-100 re-request (`client.js:265-338,
  * 816-845`), keepalive `latestReplayId` consumption (`client.js:
  * 846-857`), OUT_OF_RANGE → snapshot-resync routing (`setup.md:306`),
  * `GetSchema` through [[SchemaRegistry]], and the managed-subscription
  * `CommitReplayRequest` (`client.js:515-541`).
  */
class PubSubGrpcSpec extends SparkSpec {

  private val Token = "00DT.sessiontoken"
  private val Instance = "https://test.example.salesforce.com"
  private val Tenant = "00D000000000001EAA"
  private val Topic = "/data/AccountChangeEvent"

  private def withServer(f: (PubSubTestServer, PubSubClient, ManagedChannel) => Unit): Unit = {
    val server = new PubSubTestServer(Token, Instance, Tenant)
    server.publishDirect(Topic, Nil) // create the topic
    val name = server.start()
    val channel = InProcessChannelBuilder.forName(name).build()
    val client = new PubSubClient(channel,
      PubSubGrpc.authCallCredentials(Token, Instance, Tenant))
    try f(server, client, channel)
    finally {
      channel.shutdownNow()
      server.stop()
    }
  }

  private def ev(id: String, payload: String,
                 schemaId: String = "schema-v1",
                 changeType: String = "CREATE"): ProducerEvent =
    ProducerEvent(id, schemaId, payload.getBytes("UTF-8"),
      Seq(EventHeader("changetype", changeType.getBytes("UTF-8"))))

  private def await(latch: CountDownLatch, seconds: Int = 20): Unit =
    assert(latch.await(seconds, TimeUnit.SECONDS), "timed out waiting for stream")

  // --------------------------------------------------------------- codec

  test("proto codec round-trips every message and skips unknown fields") {
    val ce = ConsumerEvent(ev("e1", "payload-bytes"), ReplayIdCodec.encode(42L))
    // field-by-field (case classes holding Arrays compare by reference)
    val rt = decodeConsumerEvent(encodeConsumerEvent(ce))
    assert(rt.event.id == "e1" && rt.event.schemaId == "schema-v1")
    assert(new String(rt.event.payload, "UTF-8") == "payload-bytes")
    assert(rt.event.headers.map(h => (h.key, new String(h.value, "UTF-8"))) ==
      Seq(("changetype", "CREATE")))
    assert(ReplayIdCodec.decode(rt.replayId) == 42L)

    val fr = FetchRequest("t", ReplayPreset.CUSTOM, ReplayIdCodec.encode(7L), 50)
    val frRt = decodeFetchRequest(encodeFetchRequest(fr))
    assert(frRt.topicName == "t" && frRt.replayPreset == ReplayPreset.CUSTOM &&
      ReplayIdCodec.decode(frRt.replayId) == 7L && frRt.numRequested == 50)

    // proto3 defaults round-trip through total omission (empty payload)
    assert(encodeFetchRequest(FetchRequest()).isEmpty)
    assert(decodeFetchRequest(Array.emptyByteArray) == FetchRequest())

    // golden bytes: field 1 LEN "t" = 0x0A 0x01 0x74; field 4 varint 50 =
    // 0x20 0x32 — pinned so the codec provably speaks THE wire format,
    // not a self-consistent private one
    val golden = encodeFetchRequest(FetchRequest(topicName = "t", numRequested = 50))
    assert(golden.map(b => f"$b%02x").mkString(" ") == "0a 01 74 20 32")

    // unknown-field skip: a future server adding field 99 must not break us
    val w = new Writer
    w.str(1, "topic"); w.str(99, "future-field"); w.int32(4, 3)
    val dec = decodeFetchRequest(w.result())
    assert(dec.topicName == "topic" && dec.numRequested == 3)

    val mfr = ManagedFetchRequest(subscriptionId = "sub-1",
      commit = Some(CommitReplayRequest("req-1", ReplayIdCodec.encode(9L))))
    val mfrRt = decodeManagedFetchRequest(encodeManagedFetchRequest(mfr))
    assert(mfrRt.subscriptionId == "sub-1" &&
      mfrRt.commit.map(_.commitRequestId).contains("req-1") &&
      mfrRt.commit.map(c => ReplayIdCodec.decode(c.replayId)).contains(9L))
  }

  // ---------------------------------------------------------------- auth

  test("auth metadata is enforced on unary AND streaming RPCs") {
    withServer { (server, _, channel) =>
      server.putSchema("s1", """{"type":"string"}""")
      val badClient = new PubSubClient(channel,
        PubSubGrpc.authCallCredentials("WRONG", Instance, Tenant))
      val err = intercept[StatusRuntimeException](badClient.getSchema("s1"))
      assert(err.getStatus.getCode == Status.Code.UNAUTHENTICATED)

      val failed = new CountDownLatch(1)
      @volatile var code: Status.Code = null
      badClient.subscribe(Topic, new SubscribeHandler {
        override def onEvents(events: Seq[ConsumerEvent], latest: Long): Unit = ()
        override def onError(status: Status): Unit = {
          code = status.getCode; failed.countDown()
        }
      }, replayPreset = ReplayPreset.EARLIEST)
      await(failed)
      assert(code == Status.Code.UNAUTHENTICATED)

      // and the correct triple passes (the Auth.authenticate output shape)
      val goodClient = new PubSubClient(channel,
        PubSubGrpc.authCallCredentials(Token, Instance, Tenant))
      assert(goodClient.getSchema("s1") == """{"type":"string"}""")
    }
  }

  // -------------------------------------------------------- flow control

  test("flow control: server batches cap at 100, client re-requests until drained") {
    withServer { (server, client, _) =>
      server.publishDirect(Topic, (1 to 250).map(i => ev(s"e$i", s"p$i")))
      val batches = new ConcurrentLinkedQueue[Int]()
      val got = new java.util.concurrent.atomic.AtomicLong(0)
      val done = new CountDownLatch(250)
      val handle = client.subscribe(Topic, new SubscribeHandler {
        override def onEvents(events: Seq[ConsumerEvent], latest: Long): Unit = {
          batches.add(events.size)
          got.addAndGet(events.size)
          events.foreach(_ => done.countDown())
        }
      }, replayPreset = ReplayPreset.EARLIEST) // infinite mode: batches of 100
      await(done)
      assert(got.get() == 250)
      val sizes = batches.asScala.toVector
      // the server never exceeds the 100-event cap per response, and the
      // client's re-request keeps the stream flowing past the first batch
      assert(sizes.forall(_ <= 100), s"over-cap batch in $sizes")
      assert(sizes.length >= 3, s"expected >= 3 capped batches, got $sizes")
      assert(handle.lastReplayId == server.latestReplayId(Topic))
      handle.close()
    }
  }

  test("replay presets: LATEST sees only new events, CUSTOM resumes after the id") {
    withServer { (server, client, _) =>
      val preIds = server.publishDirect(Topic, (1 to 5).map(i => ev(s"pre$i", "x")))

      // LATEST: subscribe first, then publish — only the new events arrive
      val latestGot = new ConcurrentLinkedQueue[String]()
      val threeNew = new CountDownLatch(3)
      val h1 = client.subscribe(Topic, new SubscribeHandler {
        override def onEvents(events: Seq[ConsumerEvent], latest: Long): Unit = {
          events.foreach(e => latestGot.add(e.event.id)); events.foreach(_ => threeNew.countDown())
        }
      }) // default preset LATEST
      // subscribe() returns when the first request is SENT; the server
      // fixes the LATEST cursor when it PROCESSES it. Publishing in that
      // window would raise the cursor past the "new" events and the
      // latch would time out (observed once under full-suite load) —
      // wait for the registration, like the keepalive test does.
      val deadline1 = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (server.activeSubscriptions == 0 && System.nanoTime() < deadline1)
        Thread.sleep(10)
      server.publishDirect(Topic, (1 to 3).map(i => ev(s"new$i", "y")))
      await(threeNew)
      assert(latestGot.asScala.toSet == Set("new1", "new2", "new3"))
      h1.close()

      // CUSTOM: resume strictly after preIds(2) -> pre4, pre5 + the 3 new
      val customGot = new ConcurrentLinkedQueue[String]()
      val five = new CountDownLatch(5)
      val h2 = client.subscribe(Topic, new SubscribeHandler {
        override def onEvents(events: Seq[ConsumerEvent], latest: Long): Unit = {
          events.foreach(e => customGot.add(e.event.id)); events.foreach(_ => five.countDown())
        }
      }, replayPreset = ReplayPreset.CUSTOM, replayId = Some(preIds(2)))
      await(five)
      assert(customGot.asScala.toSet == Set("pre4", "pre5", "new1", "new2", "new3"))
      h2.close()
    }
  }

  // ------------------------------------------------- OUT_OF_RANGE resync

  test("OUT_OF_RANGE on a past-retention replay id routes to the resync hook") {
    withServer { (server, client, _) =>
      server.publishDirect(Topic, (1 to 10).map(i => ev(s"e$i", "x")))
      server.expireBefore(Topic, 6L) // ids 1-5 are gone

      val resyncRan = new CountDownLatch(1)
      val recovered = new ConcurrentLinkedQueue[String]()
      val allRetained = new CountDownLatch(5)
      // the reference worker's recovery (setup.md:306): on OUT_OF_RANGE,
      // run the snapshot+resubscribe fallback instead of crash-looping —
      // here the hook resubscribes EARLIEST (Bootstrap.snapshotThenStream
      // is the production body; the routing is what this spec pins)
      client.subscribe(Topic, new SubscribeHandler {
        override def onEvents(events: Seq[ConsumerEvent], latest: Long): Unit = ()
        override def onError(status: Status): Unit =
          if (status.getCode == Status.Code.OUT_OF_RANGE) {
            resyncRan.countDown()
            client.subscribe(Topic, new SubscribeHandler {
              override def onEvents(events: Seq[ConsumerEvent], latest: Long): Unit = {
                events.foreach(e => recovered.add(e.event.id))
                events.foreach(_ => allRetained.countDown())
              }
            }, replayPreset = ReplayPreset.EARLIEST)
          }
      }, replayPreset = ReplayPreset.CUSTOM, replayId = Some(2L))
      await(resyncRan)
      await(allRetained)
      assert(recovered.asScala.toSet == (6 to 10).map(i => s"e$i").toSet)
    }
  }

  // ------------------------------------------------------------ keepalive

  test("keepalive advances the latest replay id without emitting rows") {
    withServer { (server, client, _) =>
      spark // force the session: ChangeEventLog.listFiles resolves it
      server.publishDirect(Topic, (1 to 4).map(i => ev(s"e$i", "x")))
      val dir = Files.createTempDirectory("grpc_keepalive").toString
      val writer = new ChangeEventLogWriter(dir)
      @volatile var keepalives = 0
      val tick = new CountDownLatch(1)
      val handle = client.subscribe(Topic, new SubscribeHandler {
        override def onEvents(events: Seq[ConsumerEvent], latest: Long): Unit =
          writer.onEvents(events, latest)
        override def onKeepalive(latest: Long, pending: Int): Unit = {
          keepalives += 1
          writer.onKeepalive(latest, pending)
          tick.countDown()
        }
      }) // LATEST: no events flow
      // subscribe() returns before the server registers the stream — wait,
      // then tick (production keepalives repeat every <= 270 s anyway)
      val deadline = System.nanoTime() + 10_000_000_000L
      while (server.activeSubscriptions == 0 && System.nanoTime() < deadline)
        Thread.sleep(10)
      server.tickKeepalive()
      await(tick)
      assert(keepalives >= 1)
      assert(writer.latestReplayId == server.latestReplayId(Topic))
      // no rows: the log dir holds no event files
      assert(ChangeEventLog.listFiles(dir).isEmpty)
      handle.close()
    }
  }

  // ---------------------------------------------- GetSchema + registry

  test("GetSchema drives SchemaRegistry: memoized fetch, NOT_FOUND dead-letters") {
    withServer { (server, client, _) =>
      val avro = """{"type":"record","name":"r","fields":[{"name":"f","type":"string"}]}"""
      server.putSchema("schema-v1", avro)
      val registry = client.schemaRegistry()
      assert(registry.schemaJson("schema-v1") == avro)
      assert(registry.resolvable("schema-v1"))
      // genuinely-unknown id -> typed NOT_FOUND -> dead-letter predicate
      assert(!registry.resolvable("no-such-schema"))
      // memoization: the cached id resolves even after the server is gone
      server.stop()
      assert(registry.schemaJson("schema-v1") == avro)
    }
  }

  // ------------------------------------------------- managed subscription

  test("managed subscription: CommitReplayRequest persists and the stream resumes from it") {
    withServer { (server, client, _) =>
      server.defineManagedSubscription("sub-1", Topic)
      val ids = server.publishDirect(Topic, (1 to 5).map(i => ev(s"e$i", "x")))

      val seen = new ConcurrentLinkedQueue[String]()
      val five = new CountDownLatch(5)
      val acked = new CountDownLatch(1)
      @volatile var ack: CommitReplayResponse = null
      val h = client.managedSubscribe("sub-1", new SubscribeHandler {
        override def onEvents(events: Seq[ConsumerEvent], latest: Long): Unit = {
          events.foreach(e => seen.add(e.event.id))
          events.foreach(_ => five.countDown())
        }
      }, onCommitResponse = r => { ack = r; acked.countDown() })
      await(five)
      assert(seen.asScala.toSet == (1 to 5).map(i => s"e$i").toSet)

      val reqId = h.commitReplayId(ids(2)) // commit through e3
      await(acked)
      assert(ack.commitRequestId == reqId)
      assert(ReplayIdCodec.decode(ack.replayId) == ids(2))
      assert(server.committed("sub-1").contains(ids(2)))
      h.close()

      // a fresh managed stream resumes AFTER the server-stored commit
      val resumed = new ConcurrentLinkedQueue[String]()
      val two = new CountDownLatch(2)
      val h2 = client.managedSubscribe("sub-1", new SubscribeHandler {
        override def onEvents(events: Seq[ConsumerEvent], latest: Long): Unit = {
          events.foreach(e => resumed.add(e.event.id))
          events.foreach(_ => two.countDown())
        }
      })
      await(two)
      assert(resumed.asScala.toSet == Set("e4", "e5"))
      h2.close()
    }
  }

  // --------------------------------------------------------- wire -> DSv2

  test("E2E: gRPC subscribe lands batches in the change-event log the DSv2 source reads") {
    withServer { (server, client, _) =>
      spark // force the session: ChangeEventLog.listFiles resolves it
      val n = 120
      server.publishDirect(Topic, (1 to n).map(i =>
        ev(s"sf$i", s"""{"v":$i}""", changeType = if (i % 10 == 0) "DELETE" else "CREATE")))
      val dir = Files.createTempDirectory("grpc_e2e_log").toString
      val writer = new ChangeEventLogWriter(dir)
      val all = new CountDownLatch(n)
      val handle = client.subscribe(Topic, new SubscribeHandler {
        override def onEvents(events: Seq[ConsumerEvent], latest: Long): Unit = {
          writer.onEvents(events, latest)
          events.foreach(_ => all.countDown())
        }
      }, replayPreset = ReplayPreset.EARLIEST)
      await(all)
      handle.close()

      // flow control shaped the log: 100-cap batches -> >= 2 files, each
      // name carrying its row count for row-accurate admission
      val files = ChangeEventLog.listFiles(dir)
      assert(files.size >= 2)
      assert(files.flatMap(ChangeEventLog.fileRowCount).sum == n.toLong)

      val out = Files.createTempDirectory("grpc_e2e_out").toString
      val q = spark.readStream.format("graft.sources.ChangeEventLogProvider")
        .option("path", dir)
        .option("startingReplayId", "earliest")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", out + "_ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      val rows = spark.read.parquet(out)
        .select(col("replayId"), col("sfId"), col("changeType"),
          unbase64(col("data")).cast("string").as("payload"),
          col("schemaId"))
        .collect()
      assert(rows.length == n)
      assert(rows.map(_.getLong(0)).sorted.toSeq == (1L to n.toLong))
      val r7 = rows.find(_.getString(1) == "sf7").get
      assert(r7.getString(2) == "CREATE" && r7.getString(3) == """{"v":7}""" &&
        r7.getString(4) == "schema-v1")
      assert(rows.find(_.getString(1) == "sf10").get.getString(2) == "DELETE")
    }
  }
}
