package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextOps

/** Streaming corpus deduplication: first-seen exact dedup over a document
  * stream, with a PERSISTENT fingerprint index — the streaming rendering of
  * [[graft.operators.Dedup.exactGroups]] for continuous ingest (new crawl
  * snapshots arriving as a stream, only never-seen-before documents
  * admitted to the corpus).
  *
  * Per micro-batch (inside `foreachBatch`, checkpointed):
  *  1. fingerprint each doc (md5 of normalized text) and fold the batch
  *     to one candidate per fingerprint (min id — deterministic);
  *  2. anti-join against ONLY the fingerprint-index buckets the batch
  *     touches (`__bucket = pmod(xxhash64(fp), N)` partition pruning — the
  *     same layout contract as the ingest MERGE target);
  *  3. append the survivors to the output corpus AND their fingerprints to
  *     the index's touched buckets (append-only: dedup state only grows,
  *     so no read-modify-write of existing files, unlike the MERGE sink).
  *
  * At-least-once safe: a redelivered batch's fingerprints are already in
  * the index, so its docs anti-join away — output duplicates can only
  * arise from a crash BETWEEN the two appends in one batch, the same
  * at-least-once window every foreachBatch sink has; downstream exact
  * dedup of the (small) output, or idempotent-by-id consumers, absorb it.
  *
  * Scale shape: one shuffle for the per-fp fold, one bucket-pruned join
  * per batch; index I/O is O(batch + touched buckets), never O(corpus).
  */
object StreamingDedup {

  /** One micro-batch of first-seen dedup. Returns the survivors written. */
  def dedupBatch(spark: SparkSession, batch: DataFrame, idCol: String,
                 textCol: String, indexDir: String, outDir: String,
                 numBuckets: Int = CdcIngest.DefaultNumBuckets): Unit = {
    val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // 1. fingerprint + within-batch fold (keep the smallest id per fp)
    val withFp = batch.withColumn("__fp", md5(TextOps.normalized(col(textCol))))
    val folded = withFp
      .groupBy("__fp")
      .agg(min_by(struct(batch.columns.toIndexedSeq.map(col): _*), col(idCol)).as("doc"))
      .select(col("__fp"), col("doc.*"))
      .withColumn("__bucket", CdcIngest.bucketOf(col("__fp"), numBuckets))
      .cache()
    try {
      // 2. anti-join against only the touched index buckets
      val touched = folded.select("__bucket").distinct()
        .collect().map(_.getInt(0)).sorted
      val survivors =
        if (!fs.exists(new Path(indexDir)) || touched.isEmpty) folded
        else {
          val seen = spark.read.parquet(indexDir)
            .filter(col("__bucket").isin(touched.map(Integer.valueOf).toSeq: _*))
            .select(col("fp").as("__fp"))
          folded.join(seen, Seq("__fp"), "left_anti")
        }

      // 3. append survivors to the corpus, fingerprints to the index
      val out = survivors.cache()
      try {
        if (!out.isEmpty) {
          out.drop("__fp", "__bucket")
            .write.mode("append").parquet(outDir)
          out.select(col("__fp").as("fp"), col("__bucket"))
            .write.mode("append").partitionBy("__bucket").parquet(indexDir)
        }
      } finally out.unpersist()
    } finally folded.unpersist()
  }

  /** Start the checkpointed streaming dedup. */
  def start(spark: SparkSession, stream: DataFrame, idCol: String,
            textCol: String, indexDir: String, outDir: String,
            checkpointDir: String,
            numBuckets: Int = CdcIngest.DefaultNumBuckets,
            availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Retry.withBackoff() {
          dedupBatch(spark, batch, idCol, textCol, indexDir, outDir, numBuckets)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  // ------------------------------------------------------------------
  // Near-dup variant: MinHash-LSH band index + shingle store
  // ------------------------------------------------------------------

  /** One micro-batch of first-seen NEAR-dup dedup (streaming rendering of
    * [[graft.operators.Dedup.minhashLshPairs]]): a document is admitted iff
    * it is not a verified near-duplicate (n-gram Jaccard ≥ `threshold`) of
    * any previously admitted document.
    *
    * Persistent state, two bucket-partitioned parquet tables under
    * `indexDir` (both append-only — dedup state only grows):
    *  - `bands/`  : `(band, bkey, id)`, bucketed by `xxhash64(bkey)` —
    *    the LSH postings list;
    *  - `shingles/`: `(id, sh)`, bucketed by `xxhash64(id)` — the shingle
    *    sets needed for exact verification of band collisions.
    *
    * Batch plan: shingle+sign the batch once; resolve WITHIN-batch near-dups
    * (keep the min id of each verified pair — same keep-min convention as
    * [[graft.operators.Dedup.exactGroups]]); probe the band index reading
    * ONLY the buckets the batch's band keys hash into; exact-verify the
    * colliding candidates against the shingle store (again bucket-pruned,
    * by candidate id); admit the clean remainder and append its postings +
    * shingles. Per batch the state I/O is O(batch · bands + touched
    * buckets), never O(corpus).
    */
  def nearDedupBatch(spark: SparkSession, batch: DataFrame, idCol: String,
                     textCol: String, indexDir: String, outDir: String,
                     threshold: Double = 0.8, n: Int = 3,
                     numHashes: Int = 32, bands: Int = 16,
                     numBuckets: Int = CdcIngest.DefaultNumBuckets): Unit = {
    import graft.operators.Dedup
    val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bandsDir = s"$indexDir/bands"
    val shDir = s"$indexDir/shingles"

    // this batch owns the dedup operator's internal caches: without a scope,
    // every micro-batch would leave orphaned cached RDDs in executor storage
    implicit val scope: graft.CacheScope = graft.CacheScope()

    // within-batch near-dups: reject the larger id of every verified pair
    val localPairs = Dedup.minhashLshPairs(batch, idCol, textCol, threshold,
      n, numHashes, bands)
    val localKept = batch.join(
      localPairs.select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

    val sh = Dedup.withShingles(localKept, idCol, textCol, n)
      .withColumn("sig", graft.functions.minhash_signature(col("sh"), numHashes))
      .withColumn("bk", Dedup.bandKeysOfSig(col("sig"), numHashes, bands))
      .cache()
    try {
      val posting = sh.select(col("id"), col("sh"),
        posexplode(col("bk")).as(Seq("band", "bkey")))
        .withColumn("__bucket", CdcIngest.bucketOf(col("bkey"), numBuckets))
        .cache()
      try {
        // candidates among PREVIOUSLY admitted docs: bucket-pruned postings probe
        val rejected =
          if (!fs.exists(new Path(bandsDir))) sh.select("id").limit(0)
          else {
            val touched = posting.select("__bucket").distinct()
              .collect().map(_.getInt(0)).sorted
            val idxBands = spark.read.parquet(bandsDir)
              .filter(col("__bucket").isin(touched.map(Integer.valueOf).toSeq: _*))
              .select(col("band").as("i_band"), col("bkey").as("i_bkey"),
                col("id").as("i_id"))
            val cands = posting.join(idxBands,
                col("band") === col("i_band") && col("bkey") === col("i_bkey"))
              .select(col("id"), col("i_id")).distinct()
            // exact verify against the shingle store, bucket-pruned by i_id
            val candBuckets = cands
              .select(CdcIngest.bucketOf(col("i_id"), numBuckets).as("b"))
              .distinct().collect().map(_.getInt(0))
            if (candBuckets.isEmpty) cands.select("id").limit(0)
            else {
              val store = spark.read.parquet(shDir)
                .filter(col("__bucket").isin(candBuckets.map(Integer.valueOf).toSeq: _*))
                .select(col("id").as("i_id"), col("sh").as("i_sh"))
              cands
                .join(sh.select(col("id"), col("sh")), "id")
                .join(store, "i_id")
                .withColumn("inter", size(array_intersect(col("sh"), col("i_sh"))))
                .filter(col("inter").cast("double") /
                  (size(col("sh")) + size(col("i_sh")) - col("inter")) >= threshold)
                .select("id").distinct()
            }
          }

        val keptIds = sh.select("id").join(rejected, Seq("id"), "left_anti").cache()
        try {
          if (!keptIds.isEmpty) {
            localKept.join(keptIds.withColumnRenamed("id", idCol), Seq(idCol))
              .write.mode("append").parquet(outDir)
            posting.join(keptIds, Seq("id"))
              .select(col("band"), col("bkey"), col("id"), col("__bucket"))
              .write.mode("append").partitionBy("__bucket").parquet(bandsDir)
            sh.join(keptIds, Seq("id"))
              .select(col("id"), col("sh"),
                CdcIngest.bucketOf(col("id"), numBuckets).as("__bucket"))
              .write.mode("append").partitionBy("__bucket").parquet(shDir)
          }
        } finally keptIds.unpersist()
      } finally posting.unpersist()
    } finally {
      sh.unpersist()
      scope.close()
    }
  }

  // ------------------------------------------------------------------
  // Semantic variant: hyperplane-LSH band index + vector store
  // ------------------------------------------------------------------

  /** One micro-batch of first-seen SEMANTIC dedup (streaming rendering of
    * [[graft.operators.Dedup.embeddingDupPairs]]): a vector is rejected if
    * it exact-cosine-matches (≥ `threshold`) any PREVIOUSLY ADMITTED vector
    * from an earlier batch, or if it is the larger-id side of any verified
    * within-batch pair (keep-min pairwise rejection — which over-rejects
    * transitive chains: in A~B, B~C, A≁C both B and C drop; see the
    * within-batch note in the body). Continuous embedding-level dedup of
    * an ingest stream, completing the streaming matrix (exact / lexical
    * near-dup / semantic).
    *
    * Persistent state, two bucket-partitioned append-only tables under
    * `indexDir` (same layout contract as the MinHash variant):
    *  - `bands/`: `(band, key, id)`, bucketed by `xxhash64(key)` — each
    *    admitted vector's EXACT sign-LSH band keys;
    *  - `vecs/` : `(id, vec)`, bucketed by `xxhash64(id)` — for exact
    *    cosine verification of band collisions.
    *
    * The batch side probes with BLIND multi-probe (`probePlanes =
    * planesPerBand`), not the batch operator's query-directed default:
    * streaming candidate generation is single-direction (the batch probes
    * against the index's exact keys; the index cannot probe back), so only
    * the full probe set carries the per-direction analytic recall bound
    * `1-(1-P(Binom(r,θ/π) ≤ probeBits))^b` — the self-join operator gets
    * the second direction for free, a stream-vs-corpus probe does not.
    * Collisions are exact-verified, so extra probes cost candidates, never
    * correctness. Per batch the state I/O is O(batch · bands · probes +
    * touched buckets), never O(corpus).
    *
    * The band width is baked into the stored keys, and the occupancy law
    * of [[graft.operators.Dedup.planesForCorpus]] applies to the
    * ACCUMULATED index, not the batch — a long-lived stream left at the
    * small-corpus width sees per-batch candidate volume grow linearly
    * with everything admitted so far. So when `planesPerBand` is left at
    * the 0 sentinel, the width derives from `expectedCorpus` (the stream-
    * lifetime admitted-vector estimate); with neither given it falls back
    * to the tuned small-corpus 8. Sign-LSH keys are data-independent, so
    * choosing r up front is safe; changing it later means a rebuild — the
    * derivation is from the CALLER-DECLARED estimate precisely so every
    * batch of one stream agrees on it.
    */
  def semanticDedupBatch(spark: SparkSession, batch: DataFrame, idCol: String,
                         vecCol: String, indexDir: String, outDir: String,
                         threshold: Double = 0.9, planesPerBand: Int = 0,
                         bands: Int = 16, probeBits: Int = 2,
                         numBuckets: Int = CdcIngest.DefaultNumBuckets,
                         expectedCorpus: Long = 0): Unit = {
    import graft.operators.Dedup
    import graft.functions.{cosine_similarity, hyperplane_probes}
    val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bandsDir = s"$indexDir/bands"
    val vecsDir = s"$indexDir/vecs"
    val r = if (planesPerBand > 0) planesPerBand
            else if (expectedCorpus > 0) Dedup.planesForCorpus(expectedCorpus)
            else 8

    implicit val scope: graft.CacheScope = graft.CacheScope()
    try {
      // Within-batch near-dups: reject id_b of every verified pair — the
      // keep-min PAIRWISE-rejection convention (same as exactGroups' min-id
      // representative). Note this over-rejects transitive chains relative
      // to a sequential first-seen fold: in A~B, B~C, A≁C both B and C are
      // dropped even though C's only near-dup is the already-rejected B.
      // That is the intended batch semantic (deterministic, order-free,
      // one join); callers needing exact first-seen admission should
      // shrink the trigger interval so chains split across batches.
      // probePlanes is left to the auto policy, which clamps it to the
      // band width — a narrow-band caller never trips the invariant.
      val localPairs = Dedup.embeddingDupPairs(batch, idCol, vecCol, threshold,
        r, bands, probeBits)
      val localKept = batch.join(
        localPairs.select(col("id_b").as(idCol)).distinct(),
        Seq(idCol), "left_anti")

      val sk = scope.own(localKept
        .select(col(idCol).as("id"), col(vecCol).as("vec"))
        .withColumn("pk", hyperplane_probes(col("vec"), r, bands,
          probeBits, r)))
      val exploded = sk.select(col("id"), posexplode(col("pk")).as(Seq("band", "keys")))
      // exact keys (stored for future batches to probe against) and the
      // blind probe set (this batch probing the stored exact keys)
      val posting = scope.own(exploded
        .select(col("band"), element_at(col("keys"), 1).as("key"), col("id"))
        .withColumn("__bucket", CdcIngest.bucketOf(col("key"), numBuckets)))
      val probes = exploded
        .select(col("id"), col("band"), explode(col("keys")).as("key"))
        .withColumn("__bucket", CdcIngest.bucketOf(col("key"), numBuckets))

      val rejected =
        if (!fs.exists(new Path(bandsDir))) sk.select("id").limit(0)
        else {
          val touched = probes.select("__bucket").distinct()
            .collect().map(_.getInt(0)).sorted
          val idxBands = spark.read.parquet(bandsDir)
            .filter(col("__bucket").isin(touched.map(Integer.valueOf).toSeq: _*))
            .select(col("band").as("i_band"), col("key").as("i_key"),
              col("id").as("i_id"))
          val cands = probes.join(idxBands,
              col("band") === col("i_band") && col("key") === col("i_key"))
            .select(col("id"), col("i_id")).distinct()
          val candBuckets = cands
            .select(CdcIngest.bucketOf(col("i_id"), numBuckets).as("b"))
            .distinct().collect().map(_.getInt(0))
          if (candBuckets.isEmpty) sk.select("id").limit(0)
          else {
            val store = spark.read.parquet(vecsDir)
              .filter(col("__bucket").isin(candBuckets.map(Integer.valueOf).toSeq: _*))
              .select(col("id").as("i_id"), col("vec").as("i_vec"))
            cands
              .join(sk.select(col("id"), col("vec")), "id")
              .join(store, "i_id")
              .filter(round(cosine_similarity(col("vec"), col("i_vec")), 3)
                >= threshold)
              .select("id").distinct()
          }
        }

      val keptIds = scope.own(sk.select("id").join(rejected, Seq("id"), "left_anti"))
      if (!keptIds.isEmpty) {
        localKept.join(keptIds.withColumnRenamed("id", idCol), Seq(idCol))
          .write.mode("append").parquet(outDir)
        posting.join(keptIds, Seq("id"))
          .select(col("band"), col("key"), col("id"), col("__bucket"))
          .write.mode("append").partitionBy("__bucket").parquet(bandsDir)
        sk.join(keptIds, Seq("id"))
          .select(col("id"), col("vec"),
            CdcIngest.bucketOf(col("id"), numBuckets).as("__bucket"))
          .write.mode("append").partitionBy("__bucket").parquet(vecsDir)
      }
    } finally scope.close()
  }

  /** Start the checkpointed streaming SEMANTIC dedup. `expectedCorpus`
    * sizes the index's band width for the stream's LIFETIME admitted
    * volume (see [[semanticDedupBatch]]) — pass it for any long-lived
    * stream.
    */
  def startSemanticDedup(spark: SparkSession, stream: DataFrame, idCol: String,
                         vecCol: String, indexDir: String, outDir: String,
                         checkpointDir: String, threshold: Double = 0.9,
                         planesPerBand: Int = 0, bands: Int = 16,
                         probeBits: Int = 2,
                         numBuckets: Int = CdcIngest.DefaultNumBuckets,
                         availableNow: Boolean = true,
                         expectedCorpus: Long = 0): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Retry.withBackoff() {
          semanticDedupBatch(spark, batch, idCol, vecCol, indexDir, outDir,
            threshold, planesPerBand, bands, probeBits, numBuckets,
            expectedCorpus)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Start the checkpointed streaming NEAR-dup dedup. */
  def startNearDedup(spark: SparkSession, stream: DataFrame, idCol: String,
                     textCol: String, indexDir: String, outDir: String,
                     checkpointDir: String, threshold: Double = 0.8,
                     n: Int = 3, numHashes: Int = 32, bands: Int = 16,
                     numBuckets: Int = CdcIngest.DefaultNumBuckets,
                     availableNow: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Retry.withBackoff() {
          nearDedupBatch(spark, batch, idCol, textCol, indexDir, outDir,
            threshold, n, numHashes, bands, numBuckets)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
