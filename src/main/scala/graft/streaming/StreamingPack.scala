package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Curation

/** Streaming fixed-length sequence packing: the continuous-ingest rendering
  * of [[graft.operators.Curation.packSequences]]. Documents arrive as a
  * stream; each micro-batch's tokens extend the corpus token stream IN
  * ARRIVAL ORDER (deterministic `idCol` order within a batch), full
  * `seqLen` examples are appended to the training corpus as they complete,
  * and the one incomplete tail example CARRIES across batches as
  * operator state.
  *
  * State is a single logical row — `(total tokens consumed, the ≤ seqLen-1
  * carried tokens, their in-carry doc-start positions)` — versioned by
  * micro-batch id in an append-only parquet log: batch b reads the newest
  * state with id < b, so a redelivered batch recomputes FROM THE SAME
  * STATE and appends byte-identical rows (the output append itself has the
  * same at-least-once window every foreachBatch sink has — see
  * [[StreamingDedup]]'s contract).
  *
  * The per-batch plan reuses the batch operator's carve stage
  * ([[Curation.packFromPrefix]]): the carry enters as one synthetic row at
  * the last example boundary, batch docs follow at their arrival-order
  * offsets, so emitted examples are exactly what the batch operator would
  * produce on the concatenated stream. The within-batch prefix sum is a
  * single-partition window — micro-batches are admission-bounded
  * (`maxEventsPerBatch`), so batch size, not corpus size, caps it.
  */
object StreamingPack {

  /** `(totalTokens, carryToks, carryStarts)` after a given batch. */
  private val StateSchema = StructType(Seq(
    StructField("batch_id", LongType, nullable = false),
    StructField("total_tokens", LongType, nullable = false),
    StructField("carry_toks", ArrayType(StringType, containsNull = false)),
    StructField("carry_starts", ArrayType(IntegerType, containsNull = false))))

  private[streaming] final case class PackState(
      totalTokens: Long, carryToks: Seq[String], carryStarts: Seq[Int])

  private def readState(spark: SparkSession, stateDir: String,
                        beforeBatch: Long): PackState = {
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(stateDir))) return PackState(0L, Nil, Nil)
    val rows = spark.read.schema(StateSchema).parquet(stateDir)
      .filter(col("batch_id") < beforeBatch)
      .orderBy(desc("batch_id")).limit(1).collect()
    rows.headOption.map { r =>
      PackState(r.getLong(1), r.getSeq[String](2), r.getSeq[Int](3))
    }.getOrElse(PackState(0L, Nil, Nil))
  }

  /** Compact the versioned state log down to its newest `keep` rows.
    * Without this, the append-only log grows one parquet file per
    * micro-batch forever and every `readState` re-lists and scans the
    * whole directory — O(#batches) per batch, quadratic over a stream's
    * lifetime.
    *
    * `keep = 2` (the default) is the exact redelivery window: Structured
    * Streaming redelivers at most the LAST uncommitted batch, and a
    * redelivered batch `b` needs the newest state with `batch_id < b` —
    * the second-newest row (the newest row is `b`'s own failed-attempt
    * append). Crash-safe by the same ordering [[Compaction]] uses: the
    * kept rows are re-appended as one new file FIRST, superseded files are
    * deleted only after — a reader between the two steps sees duplicate
    * `batch_id` rows, which the `orderBy desc limit 1` read already
    * tolerates (tied rows are byte-identical).
    *
    * Schema-agnostic (reads whatever the log holds), so one routine serves
    * the text and id logs. Returns the number of files removed.
    */
  def compactStateLog(spark: SparkSession, stateDir: String,
                      keep: Int = 2): Int = {
    require(keep > 0, s"keep must be positive, got $keep")
    val root = new Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val oldFiles = fs.listStatus(root).toSeq
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    if (oldFiles.length <= keep) return 0
    val src = spark.read.parquet(stateDir)
      .orderBy(desc("batch_id")).limit(keep)
    // collect the <= keep tiny rows: the rewrite must not hold a read
    // lineage on the very files it is about to delete
    val rows = src.collect()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), src.schema)
      .coalesce(1).write.mode("append").parquet(stateDir)
    oldFiles.foreach(f => fs.delete(f.getPath, false))
    oldFiles.length
  }

  /** Loud alarm for the reset-checkpoint-vs-surviving-state shape (the
    * [[StreamingKnn.applyBatch]] / [[PartialLog.upsertBatch]]
    * convention): a batchId strictly below the state log's max committed
    * batch_id is legitimate ONLY as an at-least-once redelivery; after a
    * checkpoint reset it means the restarted stream reads pre-reset state
    * (or fresh zeros), re-numbers its output from b0, and — once the
    * compactor keeps only the newest (= old) rows — silently forks or
    * resets the carried state. Undecidable from one call, so processing
    * proceeds and the shape is named loudly. Contract everywhere: the
    * checkpoint dir and the state dir live and die together.
    */
  // per-state-dir memo for the rewind alarm: the on-disk max batch_id is
  // read ONCE per stream (first batch after this JVM starts); afterwards
  // the in-process high-water mark advances for free, so steady-state
  // batches pay ZERO extra Spark jobs for the alarm. The alarm itself
  // fires at most once per state dir per process — the decision point is
  // the first batch after a restart, and repeating it on every legitimate
  // at-least-once redelivery is noise, not signal.
  private val rewindHighWater =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val rewindWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[streaming] def warnIfRewound(spark: SparkSession, stateDir: String,
                                       batchId: Long, who: String): Unit = {
    val prior = Option(rewindHighWater.get(stateDir)).map(_.longValue())
      .orElse {
        val root = new Path(stateDir)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(root)) None
        else
          // one state scan per stream startup, never per batch; an
          // empty/odd state dir (no parquet yet) has nothing to warn about
          scala.util.Try(spark.read.parquet(stateDir)
              .agg(max(col("batch_id"))).collect().head)
            .toOption.filterNot(_.isNullAt(0)).map(_.getLong(0))
      }
    prior.foreach { mx =>
      if (mx > batchId && rewindWarned.add(stateDir))
        System.err.println(
          s"[$who] WARNING: batchId $batchId is below the max committed " +
            s"state batch_id $mx at $stateDir. Legitimate " +
            "only as an at-least-once redelivery; if the streaming " +
            "checkpoint was deleted/reset while this state dir survived, " +
            "the stream is now forking/rewinding its carried state — " +
            "delete the state dir and checkpoint dir together. " +
            "(warned once per state dir)")
    }
    val hw = math.max(prior.getOrElse(Long.MinValue), batchId)
    rewindHighWater.put(stateDir, java.lang.Long.valueOf(hw))
  }

  /** Auto-compaction hook: compact once the log exceeds `maxFiles` parts.
    * One `listStatus` per call — the same directory listing `readState`'s
    * parquet scan already pays, so the steady-state overhead is a bounded
    * ≤ `maxFiles`-row scan per batch instead of an ever-growing one.
    */
  private def maybeCompact(spark: SparkSession, stateDir: String,
                           maxFiles: Int = 16): Unit = {
    val root = new Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root) &&
        fs.listStatus(root).count(f =>
          f.isFile && f.getPath.getName.startsWith("part-")) > maxFiles)
      compactStateLog(spark, stateDir)
  }

  /** One micro-batch: pack `batch` (docs with a token-array column) onto
    * the carried stream, append completed examples to `outDir`, append the
    * post-batch state to `stateDir`.
    */
  def packBatch(spark: SparkSession, batch: DataFrame, idCol: String,
                toksCol: String, seqLen: Int, stateDir: String,
                outDir: String, batchId: Long): Unit = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    warnIfRewound(spark, stateDir, batchId, "StreamingPack")
    val st = readState(spark, stateDir, batchId)
    val carryLen = st.carryToks.length

    val docs = batch
      .select(col(idCol).as("__id"), col(toksCol).as("__toks"))
      .filter(size(col("__toks")) > 0)
    // arrival-order prefix within the batch, ordered by the ORIGINAL id
    // column (no lossy cast — string ids order fine); single-partition
    // window — bounded by the micro-batch, not the corpus
    val bpre = coalesce(
      sum(size(col("__toks")).cast("long"))
        .over(Window.orderBy("__id").rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val docRows = docs.select(col("__toks"),
      (lit(st.totalTokens) + bpre).as("__pre"),
      size(col("__toks")).cast("long").as("__n"),
      array(lit(0)).as("__starts"))

    // the carry re-enters at the last example boundary it left off at
    val base = st.totalTokens - carryLen
    val carryRows =
      if (carryLen == 0) docRows.limit(0)
      else spark.createDataFrame(
        java.util.List.of(Row(st.carryToks, base, carryLen.toLong, st.carryStarts)),
        StructType(Seq(
          StructField("__toks", ArrayType(StringType, containsNull = false)),
          StructField("__pre", LongType, nullable = false),
          StructField("__n", LongType, nullable = false),
          StructField("__starts", ArrayType(IntegerType, containsNull = false)))))

    val packed = Curation.packFromPrefix(
      carryRows.unionByName(docRows), "__toks", seqLen).cache()
    try {
      val full = packed.filter(col("n_tokens") === seqLen)
        .drop("__toks_arr", "__starts_arr")
      if (!full.isEmpty) full.write.mode("append").parquet(outDir)

      // carry the ARRAY forms: tokens are arbitrary caller strings, so
      // re-splitting the space-joined example_text would desync the carry
      // whenever a token itself contains whitespace
      val tail = packed.filter(col("n_tokens") < seqLen)
        .select(col("__toks_arr").as("toks"), col("__starts_arr").as("starts"))
        .collect()
      val (nToks, nStarts) = tail.headOption
        .map(r => (r.getSeq[String](0), r.getSeq[Int](1)))
        .getOrElse((Nil, Nil))
      val total = st.totalTokens +
        docs.agg(coalesce(sum(size(col("__toks"))), lit(0L)))
          .collect().head.getLong(0)
      spark.createDataFrame(
        java.util.List.of(Row(batchId, total, nToks, nStarts)), StateSchema)
        .write.mode("append").parquet(stateDir)
      maybeCompact(spark, stateDir)
    } finally packed.unpersist()
  }

  /** Start the checkpointed streaming packer over a document stream with a
    * token-array column.
    */
  def start(spark: SparkSession, stream: DataFrame, idCol: String,
            toksCol: String, seqLen: Int, stateDir: String, outDir: String,
            checkpointDir: String, availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Retry.withBackoff() {
          packBatch(spark, batch, idCol, toksCol, seqLen, stateDir, outDir, batchId)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  // ------------------------------------------------------------------
  // Id-form twin: pack an ID-ENCODED document stream (array<int>, e.g.
  // Bpe.encodeIds output) into fixed-length id examples — the streaming
  // rendering of Curation.packSequencesIds. Same carry/versioned-state
  // contract as the text packer; ids and doc_starts are arrays end to
  // end, so the carry round-trips without any string rebuild.
  // ------------------------------------------------------------------

  private val IdStateSchema = StructType(Seq(
    StructField("batch_id", LongType, nullable = false),
    StructField("total_tokens", LongType, nullable = false),
    StructField("carry_ids", ArrayType(IntegerType, containsNull = false)),
    StructField("carry_starts", ArrayType(IntegerType, containsNull = false))))

  private def readIdState(spark: SparkSession, stateDir: String,
                          beforeBatch: Long): (Long, Seq[Int], Seq[Int]) = {
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(stateDir))) return (0L, Nil, Nil)
    val rows = spark.read.schema(IdStateSchema).parquet(stateDir)
      .filter(col("batch_id") < beforeBatch)
      .orderBy(desc("batch_id")).limit(1).collect()
    rows.headOption
      .map(r => (r.getLong(1), r.getSeq[Int](2), r.getSeq[Int](3)))
      .getOrElse((0L, Nil, Nil))
  }

  /** One micro-batch of id-sequence packing (see [[packBatch]]). */
  def packIdsBatch(spark: SparkSession, batch: DataFrame, idCol: String,
                   idsCol: String, seqLen: Int, stateDir: String,
                   outDir: String, batchId: Long): Unit = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    warnIfRewound(spark, stateDir, batchId, "StreamingPack(ids)")
    val (totalTokens, carryIds, carryStarts) =
      readIdState(spark, stateDir, batchId)
    val carryLen = carryIds.length

    val docs = batch
      .select(col(idCol).as("__id"), col(idsCol).as("__toks"))
      .filter(size(col("__toks")) > 0)
    val bpre = coalesce(
      sum(size(col("__toks")).cast("long"))
        .over(Window.orderBy("__id").rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val docRows = docs.select(col("__toks"),
      (lit(totalTokens) + bpre).as("__pre"),
      size(col("__toks")).cast("long").as("__n"),
      array(lit(0)).as("__starts"))

    val base = totalTokens - carryLen
    val carryRows =
      if (carryLen == 0) docRows.limit(0)
      else spark.createDataFrame(
        java.util.List.of(Row(carryIds, base, carryLen.toLong, carryStarts)),
        StructType(Seq(
          StructField("__toks", ArrayType(IntegerType, containsNull = false)),
          StructField("__pre", LongType, nullable = false),
          StructField("__n", LongType, nullable = false),
          StructField("__starts", ArrayType(IntegerType, containsNull = false)))))

    val packed = Curation.packIdsFromPrefix(
      carryRows.unionByName(docRows), "__toks", seqLen).cache()
    try {
      val full = packed.filter(col("n_tokens") === seqLen)
      if (!full.isEmpty) full.write.mode("append").parquet(outDir)

      val tail = packed.filter(col("n_tokens") < seqLen)
        .select(col("ids"), col("doc_starts")).collect()
      val (nIds, nStarts) = tail.headOption
        .map(r => (r.getSeq[Int](0), r.getSeq[Int](1)))
        .getOrElse((Nil, Nil))
      val total = totalTokens +
        docs.agg(coalesce(sum(size(col("__toks"))), lit(0L)))
          .collect().head.getLong(0)
      spark.createDataFrame(
        java.util.List.of(Row(batchId, total, nIds, nStarts)), IdStateSchema)
        .write.mode("append").parquet(stateDir)
      maybeCompact(spark, stateDir)
    } finally packed.unpersist()
  }

  /** Start the checkpointed streaming id packer. */
  def startIds(spark: SparkSession, stream: DataFrame, idCol: String,
               idsCol: String, seqLen: Int, stateDir: String, outDir: String,
               checkpointDir: String,
               availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Retry.withBackoff() {
          packIdsBatch(spark, batch, idCol, idsCol, seqLen, stateDir, outDir,
            batchId)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Emit the carried partial id example (if any). Returns 0 or 1. */
  def flushIds(spark: SparkSession, stateDir: String, outDir: String,
               seqLen: Int): Int = {
    val (totalTokens, carryIds, carryStarts) =
      readIdState(spark, stateDir, Long.MaxValue)
    if (carryIds.isEmpty) 0
    else {
      val exampleId = (totalTokens - carryIds.length) / seqLen
      spark.createDataFrame(
        java.util.List.of(Row(exampleId, carryIds.length, carryIds,
          carryStarts, carryStarts.length)),
        StructType(Seq(
          StructField("example_id", LongType, nullable = false),
          StructField("n_tokens", IntegerType, nullable = false),
          StructField("ids", ArrayType(IntegerType, containsNull = false)),
          StructField("doc_starts", ArrayType(IntegerType, containsNull = false)),
          StructField("n_docs_started", IntegerType, nullable = false))))
        .write.mode("append").parquet(outDir)
      1
    }
  }

  /** Emit the carried partial example (if any) as a final short example —
    * end-of-corpus flush. Returns the number of examples written (0 or 1).
    */
  def flush(spark: SparkSession, stateDir: String, outDir: String,
            seqLen: Int): Int = {
    val st = readState(spark, stateDir, Long.MaxValue)
    if (st.carryToks.isEmpty) 0
    else {
      val exampleId = (st.totalTokens - st.carryToks.length) / seqLen
      spark.createDataFrame(
        java.util.List.of(Row(exampleId, st.carryToks.length,
          st.carryToks.mkString(" "), st.carryStarts.mkString(","),
          st.carryStarts.length)),
        StructType(Seq(
          StructField("example_id", LongType, nullable = false),
          StructField("n_tokens", IntegerType, nullable = false),
          StructField("example_text", StringType, nullable = false),
          StructField("doc_starts", StringType, nullable = false),
          StructField("n_docs_started", IntegerType, nullable = false))))
        .write.mode("append").parquet(outDir)
      1
    }
  }
}
