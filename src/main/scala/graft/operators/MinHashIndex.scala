package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CacheScope

/** Materialized MinHash-LSH near-dup index — the dedup sibling of
  * [[Bm25Index]]: the corpus's band keys and verification payloads live in
  * bucket-partitioned parquet so an INCOMING shard can be near-dup-checked
  * against an existing corpus without rescanning it — the shape a rolling
  * 100 TB ingest actually needs (each day's delta probes the index; the
  * full corpus is only ever shuffled once, at build).
  *
  * Layout (`numBuckets` parquet partitions each):
  *  - `bands/ (id, band, bkey)` partitioned by
  *    `__bucket = pmod(xxhash64(band, bkey), numBuckets)` — a probe opens
  *    only the buckets ITS OWN band keys hash into (literal partition
  *    pruning, asserted via scan metrics in MinHashIndexSpec);
  *  - `docs/ (id, sh, sig)` partitioned by `pmod(xxhash64(id), numBuckets)`
  *    — the verification side, opened only for the candidate ids' buckets.
  *
  * Exactness contract: `probe(delta)` emits EXACTLY the cross pairs
  * (delta × indexed) that [[Dedup.minhashLshPairs]] over the union corpus
  * would emit — same banding (a pair collides iff it shares a band key,
  * regardless of which side is indexed), same Hoeffding signature
  * prefilter, same exact-Jaccard verification on the shingle sets —
  * asserted pair-for-pair in MinHashIndexSpec and through the driver's
  * DuckDB oracle (`ns_dedup_minhash_index`, whose oracle is the exact
  * cross-pair Jaccard relation). Unlike BM25 there are NO corpus-global
  * constants (no df/avgdl), so `merge` is append-only and
  * `build(A); merge(B)` is byte-identical in layout semantics to
  * `build(A ∪ B)` — no stats recomputation step at all.
  *
  * Delta contract: probe/merge ids must be disjoint from indexed ids —
  * live OR tombstoned (band rows carry no version column, so a re-added
  * id's new bands would be masked along with its old ones). The CDC
  * update path mirrors [[Bm25Index]]: [[delete]] is an O(delta) logical
  * tombstone that every probe masks immediately; [[compact]] is the
  * amortized physical reclaim after which deleted ids may be re-merged.
  */
object MinHashIndex {

  private def sigTable(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, numHashes: Int): DataFrame =
    Dedup.withShingles(docs, idCol, textCol, n)
      .select(col("id"), col("sh"),
        graft.functions.minhash_signature(col("sh"), numHashes).as("sig"))

  private def bandRows(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame =
    sigs.select(col("id"),
      posexplode(Dedup.bandKeysOfSig(col("sig"), numHashes, bands))
        .as(Seq("band", "bkey")))

  private def bandBucket(numBuckets: Int) =
    pmod(xxhash64(col("band"), col("bkey")), lit(numBuckets.toLong)).cast("int")

  private def idBucket(numBuckets: Int) =
    pmod(xxhash64(col("id")), lit(numBuckets.toLong)).cast("int")

  private def writeTables(sigs: DataFrame, indexDir: String, numHashes: Int,
                          bands: Int, numBuckets: Int, mode: String): Unit = {
    bandRows(sigs, numHashes, bands)
      .withColumn("__bucket", bandBucket(numBuckets))
      .repartition(col("__bucket"))
      .write.mode(mode).partitionBy("__bucket").parquet(s"$indexDir/bands")
    sigs.withColumn("__bucket", idBucket(numBuckets))
      .repartition(col("__bucket"))
      .write.mode(mode).partitionBy("__bucket").parquet(s"$indexDir/docs")
  }

  /** One tokenize + signature pass over the corpus, two bucket-keyed
    * shuffles (band rows, doc rows) — paid once per corpus version
    * ([[IndexCatalog]] memoizes).
    */
  def build(docs: DataFrame, idCol: String, textCol: String, indexDir: String,
            n: Int = 3, numHashes: Int = 32, bands: Int = 16,
            numBuckets: Int = 64)
           (implicit scope: CacheScope = CacheScope.unmanaged): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val sigs = scope.own(sigTable(docs, idCol, textCol, n, numHashes))
    writeTables(sigs, indexDir, numHashes, bands, numBuckets, "overwrite")
  }

  /** Append a delta shard's band/doc rows — same bucket layout, no global
    * state, so the merged index IS the full-corpus index.
    */
  def merge(docs: DataFrame, idCol: String, textCol: String, indexDir: String,
            n: Int = 3, numHashes: Int = 32, bands: Int = 16,
            numBuckets: Int = 64)
           (implicit scope: CacheScope = CacheScope.unmanaged): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = scope.own(sigTable(docs, idCol, textCol, n, numHashes))
    writeTables(sigs, indexDir, numHashes, bands, numBuckets, "append")
  }

  /** The tombstone set `(id)` — absent directory = empty set, so
    * pre-delete artifacts stay readable unchanged.
    */
  private[operators] def tombstones(spark: SparkSession,
                                    indexDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.parquet(s"$indexDir/tombstones")
    else spark.range(0).select(col("id"))
  }

  /** LOGICAL delete: append ids to `tombstones/` — O(delta), the
    * [[Bm25Index.delete]] contract without the stats step (this index
    * has no corpus-global constants). Probes mask tombstoned ids at the
    * band-candidate stage, so a probe after delete(D) emits exactly the
    * pairs of an index built without D. Keep the set broadcast-bounded
    * with [[compact]].
    */
  def delete(spark: SparkSession, indexDir: String, ids: DataFrame,
             idCol: String): Unit =
    ids.select(col(idCol).as("id")).distinct()
      .coalesce(1)
      .write.mode("append").parquet(s"$indexDir/tombstones")

  /** PHYSICAL reclaim: rewrite `bands`/`docs` without tombstoned ids
    * (same bucket layouts), truncate the tombstone set. After compact
    * the index equals a fresh build of the live corpus and deleted ids
    * may be re-merged. Single-maintainer contract
    * ([[IndexCatalog.replaceDir]]).
    */
  def compact(spark: SparkSession, indexDir: String,
              numBuckets: Int = 64): Unit = {
    val dead = tombstones(spark, indexDir)
    if (dead.head(1).isEmpty) return
    Seq("bands", "docs").foreach { sub =>
      val cleaned = spark.read.parquet(s"$indexDir/$sub")
        .join(broadcast(dead), Seq("id"), "left_anti")
      cleaned.repartition(col("__bucket"))
        .write.mode("overwrite").partitionBy("__bucket")
        .parquet(s"$indexDir/.$sub-compact")
      IndexCatalog.replaceDir(spark, s"$indexDir/.$sub-compact",
        s"$indexDir/$sub")
    }
    spark.createDataFrame(java.util.Collections.emptyList[
        org.apache.spark.sql.Row](), dead.schema)
      .write.mode("overwrite").parquet(s"$indexDir/tombstones")
  }

  /** Near-dup pairs between `newDocs` and the indexed corpus:
    * `(id_new, id_old, jaccard)` with exact Jaccard ≥ `threshold`.
    *
    * Plan: the delta's band keys prune `bands/` to ≤ min(numBuckets,
    * |delta|·bands) partitions (bucket list = one tiny distinct-collect,
    * bounded by numBuckets); the band join yields candidate pairs; the
    * candidates' id-buckets prune `docs/` the same way; then the standard
    * two-stage verify — Hoeffding signature prefilter
    * ([[Dedup.sigMarginForMissBound]]) on the ~128 B signatures, exact
    * shingle-set Jaccard on survivors. Nothing corpus-sized moves except
    * the pruned bucket reads.
    */
  def probe(spark: SparkSession, indexDir: String, newDocs: DataFrame,
            idCol: String, textCol: String, threshold: Double, n: Int = 3,
            numHashes: Int = 32, bands: Int = 16, numBuckets: Int = 64,
            sigPrefilterMargin: Double = -1.0)
           (implicit scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigsNew = scope.own(sigTable(newDocs, idCol, textCol, n, numHashes))
    val bandNew = scope.own(bandRows(sigsNew, numHashes, bands))

    val bandBuckets = bandNew.select(bandBucket(numBuckets).as("b"))
      .distinct().collect().map(_.getInt(0)).sorted
    val idxBands = spark.read.parquet(s"$indexDir/bands")
      .filter(col("__bucket").isin(bandBuckets.map(Integer.valueOf).toSeq: _*))
      // tombstone mask at the candidate stage: a dead id can never
      // surface as id_old, so the downstream docs/ reads and verifies
      // stay live-only with no extra bucket opened
      .join(broadcast(tombstones(spark, indexDir)), Seq("id"), "left_anti")

    val candidates = scope.own(bandNew.as("q").join(idxBands.as("i"),
        col("q.band") === col("i.band") && col("q.bkey") === col("i.bkey"))
      .select(col("q.id").as("id_new"), col("i.id").as("id_old"))
      .distinct())

    val candBuckets = candidates
      .select(pmod(xxhash64(col("id_old")), lit(numBuckets.toLong))
        .cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).sorted
    // two-stage docs prune: bucket isin (partition-level, skips unprobed
    // buckets entirely) THEN a candidate-id semi-join (row-level). The
    // semi-join matters when the delta is large enough to touch every
    // bucket — a 10% delta at 5 M rows opens all 64, and without it the
    // FULL ~KB-per-row shingle payload of the index is cached and built
    // into both verify hash relations while only candidate rows are ever
    // used (measured: the 5 M probe read 115 s vs 97 s for the full
    // rescan; candidates are the contract's working set, not the index).
    val idxDocs = scope.own(spark.read.parquet(s"$indexDir/docs")
      .filter(col("__bucket").isin(candBuckets.map(Integer.valueOf).toSeq: _*))
      .join(candidates.select(col("id_old").as("id")).distinct(),
        Seq("id"), "left_semi"))

    val margin =
      if (sigPrefilterMargin < 0) Dedup.sigMarginForMissBound(numHashes)
      else sigPrefilterMargin
    val cut = threshold - margin
    val toVerify =
      if (cut <= 0) candidates
      else {
        val agree = aggregate(
          zip_with(col("sig_new"), col("sig_old"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v)
        candidates
          .join(sigsNew.select(col("id").as("id_new"),
            col("sig").as("sig_new")), "id_new")
          .join(idxDocs.select(col("id").as("id_old"),
            col("sig").as("sig_old")), "id_old")
          .filter(agree.cast("double") / numHashes >= cut)
          .select(col("id_new"), col("id_old"))
      }

    toVerify
      .join(sigsNew.select(col("id").as("id_new"), col("sh").as("sh_new")),
        "id_new")
      .join(idxDocs.select(col("id").as("id_old"), col("sh").as("sh_old")),
        "id_old")
      .withColumn("inter", size(array_intersect(col("sh_new"), col("sh_old"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_new")) + size(col("sh_old")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_new"), col("id_old"), col("jaccard"))
  }
}
