package graft.sources

import org.sparkproject.connect.grpc.{Channel, InsecureChannelCredentials, ManagedChannel, TlsChannelCredentials}
import graft.sources.PubSubProto.ReplayPreset
import org.sparkproject.connect.grpc.netty.NettyChannelBuilder

/** Production dial-out: the compiled assembly of the full ingest front —
  * `Auth.authenticate` → TLS channel (`NettyChannelBuilder.forTarget`)
  * + [[PubSubGrpc.authCallCredentials]] → [[PubSubClient]] →
  * [[ChangeEventLogWriter]] — so the README SEAMS table's "production
  * delta" is literally configuration, not an uncompiled comment.
  *
  * This is the reference worker's boot sequence (`client.js:124-189`:
  * authenticate once, build the secure channel, open the subscription)
  * as one config-driven builder. What a sandbox cannot exercise is ONLY
  * the live org behind the endpoint: [[connect]] takes an injectable
  * `Channel`, and `PubSubConnectSpec` drives the identical assembly —
  * auth metadata, subscribe, flow control, log landing, DSv2 read-back —
  * against the in-process server; [[main]]'s `--dry-run` builds the real
  * Netty channel (TLS credentials and all) and the full client stack
  * without issuing an RPC (gRPC channels connect lazily on first call),
  * so the dial path itself compiles, assembles, and shuts down cleanly.
  *
  * Scale shape: one pump per topic (the reference runs one worker per
  * subscription); Spark parallelism starts at the log directory the
  * writer lands batches in — see the [[PubSubGrpc]] scaladoc.
  */
object PubSubConnect {

  /** Everything the boot sequence needs. `tenantId` defaults to the org
    * ID the auth flow resolves (the reference's `tenantid` metadata is
    * the org ID, `client.js:160-174`). `plaintext` switches the channel
    * to insecure credentials for dev targets; production stays TLS.
    */
  final case class Config(
      endpoint: String,
      topic: String,
      logDir: String,
      auth: Auth.Mode,
      tenantId: Option[String] = None,
      replayPreset: Int = ReplayPreset.LATEST,
      replayId: Option[Long] = None,
      numRequested: Option[Int] = None,
      plaintext: Boolean = false)

  /** A live (or assembled-but-undialed) ingest front. Close order:
    * half-close the subscription, then drain the channel. */
  final class Connection(val channel: Option[ManagedChannel],
                         val client: PubSubClient,
                         val writer: ChangeEventLogWriter,
                         val handle: SubscriptionHandle[PubSubProto.FetchRequest],
                         terminal: java.util.concurrent.atomic.AtomicReference[Option[(String, String)]]) {
    /** Non-empty once the stream has terminally ended (server error or
      * orderly end-of-stream) — the supervisor signal: a one-pump worker
      * whose stream died must exit and be restarted, not sleep looking
      * healthy while zero events land. */
    def terminalReason: Option[String] = terminal.get().map(_._1)
    /** The gRPC status code name of the terminal error (`"OUT_OF_RANGE"`,
      * `"UNAVAILABLE"`, …), or `"OK"` for an orderly server end-of-stream
      * — the [[supervise]] routing key. */
    def terminalCode: Option[String] = terminal.get().map(_._2)
    def close(): Unit = {
      handle.close()
      channel.foreach { ch =>
        ch.shutdown()
        ch.awaitTermination(10, java.util.concurrent.TimeUnit.SECONDS)
      }
    }
  }

  /** The transport: a Netty channel at `cfg.endpoint` with TLS channel
    * credentials (the production posture) or insecure ones
    * (`plaintext = true`, dev only). Construction does not dial —
    * grpc-java channels connect on first RPC. */
  def channel(cfg: Config): ManagedChannel =
    NettyChannelBuilder.forTarget(cfg.endpoint,
      if (cfg.plaintext) InsecureChannelCredentials.create()
      else TlsChannelCredentials.create()).build()

  /** Resolve the session triple for the configured auth mode:
    * USER_SUPPLIED short-circuits ([[Auth.userSuppliedMetadata]], no
    * network), every OAuth flow goes through [[Auth.authenticate]]. */
  def resolveMetadata(cfg: Config,
                      http: Auth.HttpExec = Auth.defaultHttp): Auth.ConnectionMetadata =
    cfg.auth match {
      case m: Auth.UserSupplied => Auth.userSuppliedMetadata(m)
      case m => Auth.authenticate(m, http)
    }

  /** Assemble the whole front and open the subscription. Pass
    * `channelOverride` to run the identical assembly over a non-dialing
    * transport (the spec's in-process channel); otherwise the TLS Netty
    * channel from [[channel]] is built and owned by the returned
    * [[Connection]] (closed with it).
    */
  def connect(cfg: Config, http: Auth.HttpExec = Auth.defaultHttp,
              channelOverride: Option[Channel] = None): Connection = {
    val meta = resolveMetadata(cfg, http)
    val tenant = cfg.tenantId.orElse(meta.organizationId).getOrElse(
      throw new IllegalArgumentException(
        "no tenant id: pass Config.tenantId or an auth mode that resolves the org id"))
    val creds = PubSubGrpc.authCallCredentials(meta.accessToken,
      meta.instanceUrl, tenant)
    val owned = if (channelOverride.isDefined) None else Some(channel(cfg))
    try {
      val ch: Channel = channelOverride.getOrElse(owned.get)
      val client = new PubSubClient(ch, creds)
      val writer = new ChangeEventLogWriter(cfg.logDir)
      // terminal-state monitor around the writer: the writer keeps its
      // no-op onError/onEnd (the DSv2 log contract), the connection
      // records WHY the stream died so a supervisor loop can act
      val terminal =
        new java.util.concurrent.atomic.AtomicReference[Option[(String, String)]](None)
      val monitored = new SubscribeHandler {
        override def onEvents(events: Seq[PubSubProto.ConsumerEvent],
                              latest: Long): Unit =
          writer.onEvents(events, latest)
        override def onKeepalive(latest: Long, pending: Int): Unit =
          writer.onKeepalive(latest, pending)
        override def onError(status: org.sparkproject.connect.grpc.Status): Unit = {
          writer.onError(status)
          terminal.set(Some((s"stream error: ${status.getCode} ${
            Option(status.getDescription).getOrElse("")}",
            status.getCode.name)))
        }
        override def onEnd(): Unit = {
          writer.onEnd()
          terminal.set(Some(("server ended the stream", "OK")))
        }
      }
      val handle = client.subscribe(cfg.topic, monitored, cfg.replayPreset,
        cfg.replayId, cfg.numRequested)
      new Connection(owned, client, writer, handle, terminal)
    } catch {
      // don't leak the owned channel's threads/sockets when the writer
      // or the subscribe request throws mid-assembly
      case e: Throwable =>
        owned.foreach(_.shutdownNow())
        throw e
    }
  }

  /** Supervised subscription loop — the reference worker's restart
    * posture in-process (`index.ts:83-85` relies on the platform
    * restarting the crashed worker; the setup doc's retry components run
    * exponential backoff, `initialBackoffMs` ×2 per attempt,
    * `maxAttempts` ≈ 4 — Node-based_Salesforce_PubSub_Setup.md
    * `defaultRetryBehavior`). Instead of exiting on the FIRST dead
    * stream (the plain `main` path, which delegates every restart to an
    * external supervisor), this re-dials in-process:
    *
    *  - terminal stream error or orderly end → close, back off
    *    (`initialBackoffMs` · 2^(consecutiveFailures−1)), reconnect
    *    resuming CUSTOM from the last landed replay id (no events lost
    *    or re-fetched: the writer already landed everything at or below
    *    it);
    *  - `OUT_OF_RANGE` → the resume id has aged past the bus's retention
    *    window; replaying it is permanently impossible, so the attempt
    *    routes through `resync` — defaulting to an EARLIEST re-land of
    *    the topic, the in-process analog of the T3 snapshot-resync path
    *    ([[graft.streaming.SyncState.resyncIfStale]]; a full deployment
    *    hooks [[graft.streaming.Bootstrap.snapshotThenStream]] here);
    *  - a stream that made progress (the server responded at least
    *    once) resets the failure counter — only CONSECUTIVE dead dials
    *    escalate toward giving up;
    *  - `maxConsecutiveFailures` dead dials in a row → give up and
    *    return 1 for the outer supervisor (the container restart is
    *    still the last line, as in the reference).
    *
    * `channelFactory` dials a fresh transport per attempt, owned and
    * shut down by this loop after the attempt (`None` = the production
    * Netty channel from [[channel]], owned and closed by the
    * Connection); `sleep`/`pollMs` are injectable so the spec can
    * compress time.
    */
  def supervise(cfg: Config, http: Auth.HttpExec = Auth.defaultHttp,
                channelFactory: Option[() => ManagedChannel] = None,
                maxConsecutiveFailures: Int = 4,
                initialBackoffMs: Long = 500L,
                pollMs: Long = 1000L,
                sleep: Long => Unit = Thread.sleep,
                resync: Config => Config = c =>
                  c.copy(replayPreset = ReplayPreset.EARLIEST, replayId = None),
                log: String => Unit = System.err.println): Int = {
    var current = cfg
    var consecutiveFailures = 0
    var resumeId = cfg.replayId.getOrElse(-1L)
    // true while the CURRENT attempt is the resync an OUT_OF_RANGE routed
    // us to — a second OUT_OF_RANGE right after a resync IS budget-worthy
    // (a server that rejects every position would otherwise loop free)
    var resyncArmed = false
    while (consecutiveFailures < maxConsecutiveFailures) {
      var progressed = false
      var outOfRange = false
      // the factory channel is owned HERE, not by the Connection
      // (channelOverride connections own nothing) — without this shutdown
      // every attempt of a long-lived worker leaks one ManagedChannel
      val attemptChannel = channelFactory.map(_())
      try {
        val conn = connect(current, http, attemptChannel)
        try {
          log(s"subscribed topic=${current.topic} " +
            s"preset=${current.replayPreset}" +
            current.replayId.fold("")(r => s":$r"))
          while (conn.terminalReason.isEmpty) sleep(pollMs)
          log(s"subscription terminated: ${conn.terminalReason.get}")
          // the server responded at least once (events or keepalive) —
          // a live-then-killed stream, not a dead dial. For EVENT batches
          // lastReplayId advances only AFTER the handler lands the batch
          // (PubSubGrpc sets the ref post-onEvents), so a resume never
          // skips events the writer failed to persist. KEEPALIVE replay
          // ids also advance it on the wire — safe to resume from, because
          // a keepalive's latestReplayId asserts the server has no
          // undelivered events at or below that id.
          progressed = conn.handle.lastReplayId >= 0
          if (progressed) resumeId = conn.handle.lastReplayId
          outOfRange = conn.terminalCode.contains("OUT_OF_RANGE")
        } finally conn.close()
      } catch {
        case e: IllegalArgumentException => throw e // config error: no retry
        case e: InterruptedException =>
          // an interrupt is a SHUTDOWN request, not a failed dial: restore
          // the flag (callers poll it) and exit the supervision loop instead
          // of burning the retry budget re-dialing through it
          Thread.currentThread().interrupt()
          log(s"supervision interrupted: ${Option(e.getMessage).getOrElse("")}")
          return 130 // the finally below still closes attemptChannel
        case scala.util.control.NonFatal(e) =>
          // fatal JVM errors (OOM, LinkageError) propagate — swallowing one
          // into the retry budget would loop a corrupted process
          log(s"dial failed: ${Option(e.getMessage).getOrElse(e.getClass.getName)}")
      } finally attemptChannel.foreach { ch =>
        ch.shutdownNow()
        // must not throw: with the interrupt flag restored by the catch
        // above, a bare awaitTermination throws InterruptedException from
        // the finally and REPLACES the `return 130` (abrupt-completion
        // rule) — the supervisor would crash on the exact shutdown path
        // the interrupt handling exists for. Swallow and re-assert.
        try ch.awaitTermination(5, java.util.concurrent.TimeUnit.SECONDS)
        catch { case _: InterruptedException => Thread.currentThread().interrupt() }
        ()
      }
      // progress RESETS the counter: only consecutive dead dials count
      // toward giving up (a stream that served events for hours and died
      // has zero dead dials against it). A FIRST OUT_OF_RANGE is neither:
      // the server answered with a definitive position error, and the
      // documented contract is to resync, not to burn budget — at
      // --max-retries 1 counting it would exit without ever attempting
      // the EARLIEST resync. Only an OUT_OF_RANGE on the resync attempt
      // itself (resyncArmed) counts, so a server rejecting every
      // position still decays the budget.
      consecutiveFailures =
        if (progressed) 0
        else if (outOfRange && !resyncArmed) consecutiveFailures
        else consecutiveFailures + 1
      if (consecutiveFailures < maxConsecutiveFailures) {
        current =
          if (outOfRange) {
            // the resume id is proven unreplayable (past retention) —
            // clear it, or the attempt AFTER a failed resync dial would
            // revert to CUSTOM at an id that is guaranteed OUT_OF_RANGE
            // again, burning the failure budget on dials that cannot work
            resumeId = -1L
            resync(current)
          } else if (resumeId >= 0)
            current.copy(replayPreset = ReplayPreset.CUSTOM,
              replayId = Some(resumeId))
          else current
        resyncArmed = outOfRange
        val backoff =
          initialBackoffMs << math.min(math.max(consecutiveFailures - 1, 0), 20)
        log(s"resubscribing in ${backoff}ms " +
          s"(consecutive failures: $consecutiveFailures)" +
          (if (outOfRange) " via OUT_OF_RANGE resync" else ""))
        sleep(backoff)
      }
    }
    log(s"giving up after $maxConsecutiveFailures consecutive dead dials")
    1
  }

  /** PKCS#8 PEM private key (the JWT flow's signing key), as the
    * reference reads it from config (`auth.js:98-112`). */
  def privateKeyFromPem(pem: String): java.security.PrivateKey = {
    val body = pem.linesIterator
      .filterNot(l => l.startsWith("-----") || l.trim.isEmpty)
      .mkString
    java.security.KeyFactory.getInstance("RSA").generatePrivate(
      new java.security.spec.PKCS8EncodedKeySpec(
        java.util.Base64.getMimeDecoder.decode(body)))
  }

  private def parseAuth(a: Map[String, String]): Auth.Mode =
    a.getOrElse("auth", "user-supplied") match {
      case "user-supplied" => Auth.UserSupplied(
        a("access-token"), a("instance-url"), a.get("org-id"))
      case "password" => Auth.UsernamePassword(
        a("login-url"), a("client-id"), a("client-secret"),
        a("username"), a("password"), a.getOrElse("user-token", ""))
      case "client-credentials" => Auth.ClientCredentials(
        a("login-url"), a("client-id"), a("client-secret"))
      case "jwt" => Auth.JwtBearer(
        a("login-url"), a("client-id"), a("username"),
        privateKeyFromPem(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(a("jwt-key-file"))),
          java.nio.charset.StandardCharsets.UTF_8)))
      case other => throw new IllegalArgumentException(
        s"unknown --auth '$other' (user-supplied|password|client-credentials|jwt)")
    }

  /** CLI entrypoint.
    *
    * {{{
    * runMain graft.sources.PubSubConnect \
    *   --endpoint api.pubsub.salesforce.com:7443 \
    *   --topic /data/AccountChangeEvent --log-dir /data/cdc-log \
    *   --auth client-credentials --login-url https://login.salesforce.com \
    *   --client-id ... --client-secret ... \
    *   [--tenant-id 00D...] [--replay latest|earliest|custom --replay-id N] \
    *   [--plaintext] [--dry-run]
    * }}}
    *
    * `--dry-run`: authenticate is SKIPPED for OAuth modes (it would dial
    * the token endpoint) unless the mode is user-supplied; the Netty
    * channel, call credentials, client, writer, and subscription request
    * shape are all constructed, printed, and torn down without an RPC.
    */
  def main(args: Array[String]): Unit = {
    val flagNames = Set("--dry-run", "--plaintext", "--resubscribe")
    val flagSet = scala.collection.mutable.Set[String]()
    val kv = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      if (flagNames(args(i))) { flagSet += args(i); i += 1 }
      else if (args(i).startsWith("--") && i + 1 < args.length) {
        kv(args(i).drop(2)) = args(i + 1); i += 2
      } else throw new IllegalArgumentException(s"unexpected arg '${args(i)}'")
    }
    val a = kv.toMap
    val flags = flagSet.toSet
    val dryRun = flags("--dry-run")
    val cfg = Config(
      endpoint = a("endpoint"),
      topic = a("topic"),
      logDir = a("log-dir"),
      auth = parseAuth(a),
      tenantId = a.get("tenant-id"),
      replayPreset = a.getOrElse("replay", "latest") match {
        case "latest" => ReplayPreset.LATEST
        case "earliest" => ReplayPreset.EARLIEST
        case "custom" => ReplayPreset.CUSTOM
        case other => throw new IllegalArgumentException(s"unknown --replay '$other'")
      },
      replayId = a.get("replay-id").map(_.toLong),
      numRequested = a.get("num-requested").map(_.toInt),
      plaintext = flags("--plaintext"))

    if (dryRun) {
      // Assemble everything constructible without a live endpoint: the
      // real Netty channel (TLS unless --plaintext), placeholder or real
      // user-supplied credentials, the client, the log writer. No RPC is
      // issued; the channel never dials.
      val meta = cfg.auth match {
        case m: Auth.UserSupplied => Auth.userSuppliedMetadata(m)
        case _ => Auth.ConnectionMetadata("dry-run-token!", "https://dry.run",
          cfg.tenantId.orElse(Some("00D000000000000")), None)
      }
      val ch = channel(cfg)
      try {
        val creds = PubSubGrpc.authCallCredentials(meta.accessToken,
          meta.instanceUrl, cfg.tenantId.orElse(meta.organizationId).get)
        val client = new PubSubClient(ch, creds)
        val writer = new ChangeEventLogWriter(cfg.logDir)
        require(client != null && writer != null)
        println(s"DRY-RUN OK endpoint=${cfg.endpoint} " +
          s"transport=${if (cfg.plaintext) "plaintext" else "tls"} " +
          s"topic=${cfg.topic} logDir=${cfg.logDir} " +
          s"replay=${cfg.replayPreset}${cfg.replayId.fold("")(r => s":$r")} " +
          s"auth=${cfg.auth.getClass.getSimpleName}")
      } finally {
        ch.shutdownNow()
        ch.awaitTermination(5, java.util.concurrent.TimeUnit.SECONDS)
      }
      return
    }

    if (flags("--resubscribe")) {
      // in-process supervision (reference parity with the setup doc's
      // exponential-backoff retry components): re-dial on dead streams,
      // resume CUSTOM from the last landed replay id, OUT_OF_RANGE →
      // EARLIEST resync; exit non-zero only after --max-retries
      // consecutive dead dials
      sys.exit(supervise(cfg,
        maxConsecutiveFailures = a.get("max-retries").fold(4)(_.toInt),
        initialBackoffMs = a.get("backoff-ms").fold(500L)(_.toLong)))
    }

    val conn = connect(cfg)
    println(s"subscribed topic=${cfg.topic} -> ${cfg.logDir} " +
      s"(lastReplayId=${conn.handle.lastReplayId})")
    sys.addShutdownHook(conn.close())
    // pump runs on gRPC's transport threads; keep the JVM alive but
    // EXIT on a dead stream (expired token, network cut, server end) so
    // a supervisor restarts the worker instead of it sleeping forever
    // looking healthy while zero events land (--resubscribe supervises
    // in-process instead)
    while (conn.terminalReason.isEmpty) Thread.sleep(1000)
    System.err.println(s"subscription terminated: ${conn.terminalReason.get}")
    conn.close()
    sys.exit(1)
  }
}
