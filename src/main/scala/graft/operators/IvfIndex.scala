package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{cosine_similarity, VectorKernels}

/** IVF-flat ANN index: k-means-style inverted lists over an embedding
  * column, the second scale path for similarity search next to the
  * hyperplane-LSH index ([[Similarity.buildIndex]]). IVF adapts to the
  * data distribution (centroids sit where the vectors are), where sign-LSH
  * buckets are data-independent.
  *
  * Everything is deterministic — seeding uses fixed hashes, refinement is
  * plain averaging — so a rebuilt index is byte-identical and specs can
  * assert exact recall numbers.
  *
  * Build (all DataFrame ops, no driver-side vector loops):
  *  1. seed k centroids: the vectors with the smallest `xxhash64(id)`
  *     (a deterministic pseudo-random spread);
  *  2. Lloyd iterations: assign every vector to its max-cosine centroid
  *     ([[assign]]: packed-long argmax over broadcast centroids, routed
  *     through the √k hierarchy past [[RoutedThreshold]] — the only
  *     shuffle is the N-row HashAggregate), then recompute centroids as
  *     per-dimension means (one `vector_avg` aggregate); empty clusters
  *     keep their previous centroid;
  *  3. write the lists clustered + partitioned by `cid` (one file per
  *     list) and the k centroids as a side table.
  *
  * Probe ([[topK]]): rank centroids against the query DRIVER-side (k·dim
  * floats — bounded, tiny), then scan ONLY the top-`nprobe` lists via a
  * literal `isin` on the partition column (planning-time pruning, same
  * contract as [[Similarity.indexTopK]]) and run exact cosine top-k.
  */
object IvfIndex {

  // centroids live beside (not inside) the lists dir so a lists read never
  // mixes schemas; no underscore prefix — Spark's listing would treat the
  // dir as hidden metadata
  private def listsDir(indexDir: String) = s"$indexDir/lists"
  private def centroidsDir(indexDir: String) = s"$indexDir/centroids"

  /** Assign each (id, vec) to its max-cosine centroid, returning
    * `(id, cid, vec)`.
    *
    * Law (shared with [[SemDedup.assign]] — ONE cross-engine convention
    * for every k-means surface): highest rounded-3 cosine, ties to the
    * SMALLER cid. The argmax runs as [[SemDedup.argmaxPacked]]'s
    * primitive `max()` over a packed long — map-side-combinable
    * HashAggregate — NOT a `max_by(cid, struct(cos, cid))`, whose struct
    * buffer silently falls back to SortAggregate and SORTS the whole
    * N·k candidate relation per pass (RUNTIME.md §6; replacing the same
    * shape in SemDedup measured 160 s → 9.8 s at 1 M×2442).
    *
    * The argmax output is skinny `(id, cid)`; the vector the list write
    * needs comes from ONE hash join back to `vecs` on `id`. That join is
    * deliberate, not avoidable overhead: carrying `vec` through the
    * aggregate itself (`first(v)`) would put an array in the aggregate
    * buffer, which is non-mutable and silently demotes the whole
    * aggregate to SortAggregate over the N·k candidate relation WITH the
    * vector payload on every row — the exact wall being retired (plan
    * verified; see the [[SemDedup.argmaxPacked]] scaladoc).
    *
    * Dispatch on `k` (the [[SemDedup.RoutedThreshold]] shared seam): at
    * or below it the flat path scans all k broadcast centroids per
    * vector; above it — auto-sized k ∝ N makes the flat scan quadratic
    * in N — assignment routes through the two-level super-centroid
    * hierarchy, O((1+nprobe)·√k) per vector.
    *
    * PRECONDITION: `id` is unique in `vecs`. The skinny-argmax +
    * join-back shape emits one output row PER MATCHING vecs ROW — with a
    * duplicate id the old groupBy shape emitted one row, this one fans
    * out, silently inflating the list write. Every caller satisfies this
    * (ids are primary keys of the corpus tables); NOT checked at runtime
    * — an exact check is a full extra aggregate on the hot encode path,
    * and dedup-by-id here would silently pick an arbitrary vector per
    * id, which is worse than the fan-out it hides.
    */
  private[graft] def assign(vecs: DataFrame, centroids: DataFrame,
                            k: Int): DataFrame = {
    val v = vecs.select(col("id"), col("vec").as("v"))
    val asg =
      if (k <= SemDedup.RoutedThreshold)
        SemDedup.argmaxPacked(
          v.crossJoin(broadcast(centroids))
            .withColumn("cos",
              round(cosine_similarity(col("v"), col("cvec")), 3)))
      else SemDedup.assignRouted(v, "id", "v", centroids)
    asg.select("id", "cid").join(vecs, "id")
  }

  /** Build the index at `indexDir`. `k` lists, `iterations` Lloyd rounds
    * over a deterministic sample of at most `trainRows` vectors — the
    * [[PqIndex.build]] training discipline: centroids need a
    * REPRESENTATIVE sample, not the corpus, and an uncapped Lloyd round
    * is N·k cosines with k typically growing as N/occupancy — quadratic
    * in N, the same wall [[SemDedup.assignRouted]] retires for
    * assignment. With the cap the training term is `trainRows·k` per
    * round and only the single final list-encode pass touches all N.
    * When the corpus is at most `trainRows` rows the sample IS the
    * corpus (same set — order cannot change an assign/average round), so
    * gate-SF builds and their learned-artifact oracles are byte-
    * identical to the uncapped form. `vecs` is cached for the build: the
    * lineage references it across rounds, and without the cache every
    * reference re-scans the source.
    */
  def build(embs: DataFrame, idCol: String, vecCol: String, indexDir: String,
            k: Int = 16, iterations: Int = 2,
            trainRows: Int = 200000): Unit = {
    val vecs = embs.select(col(idCol).as("id"), col(vecCol).as("vec")).cache()
    try buildCached(vecs, indexDir, k, iterations, trainRows)
    finally vecs.unpersist()
  }

  private def buildCached(vecs: DataFrame, indexDir: String,
                          k: Int, iterations: Int, trainRows: Int): Unit = {
    // Deterministic training sample by HASH FILTER, not a sorted top-k:
    // rows where xxhash64(id) mod ceil(N/cap) == 0 — a zero-shuffle
    // codegen'd filter over the cached corpus. (The first cut used
    // `orderBy(h, id).limit(cap)`, and a TakeOrdered at cap=200 000 keeps
    // a 200 k-element queue PER PARTITION and merges them on the driver
    // — measured SLOWER at 1 M×489 than the uncapped N·k Lloyd it was
    // supposed to retire. A modulo filter costs one count of the cached
    // input and nothing else.) At or below the cap no filter is applied,
    // so gate-SF builds and their learned-artifact oracles are
    // byte-identical to the historical uncapped form. The cap never
    // drops below k·4 so every centroid keeps seed + evidence; raise
    // trainRows with k at extreme auto-sized corpora (occupancy
    // trainRows/k is the per-centroid evidence).
    val total = vecs.count() // cached by build(); one cheap pass
    val cap = math.max(trainRows.toLong, 4L * k)
    val withH = vecs.withColumn("h", xxhash64(col("id")))
    val train =
      if (total <= cap) withH
      else withH.filter(pmod(col("h"), lit(total / cap + 1L)) === 0L)

    // deterministic seeds: smallest xxhash64(id) inside the sample (the
    // whole corpus when uncapped); the rank window runs over only the k
    // seed rows
    var centroids = train
      .orderBy("h", "id").limit(k)
      .withColumn("cid", row_number().over(Window.orderBy("h", "id")) - 1)
      .select(col("cid"), col("vec").as("cvec"))

    (0 until iterations).foreach { _ =>
      // centroid refinement: ONE map-side-combinable aggregate over
      // intact vector rows (vector_avg) — not a posexplode of N·dim rows.
      // `train` re-derives from the CACHED corpus each round — a filter
      // scan, deliberately not cached itself (columnar-caching array
      // columns costs more than the filter, the semroute lesson)
      val means = assign(train.select("id", "vec"), centroids, k)
        .groupBy("cid")
        .agg(graft.functions.vector_avg(col("vec")).as("cvec"))
      // empty clusters (no assigned vectors) keep their previous centroid
      centroids = centroids.as("old")
        .join(means.as("new"), Seq("cid"), "left")
        .select(col("cid"),
          coalesce(col("new.cvec"), col("old.cvec")).as("cvec"))
    }

    centroids.coalesce(1).write.mode("overwrite")
      .parquet(centroidsDir(indexDir))
    val cents = spark(vecs).read.parquet(centroidsDir(indexDir))
    assign(vecs, cents, k)
      .repartition(col("cid")) // one file per inverted list
      .write.mode("overwrite").partitionBy("cid").parquet(listsDir(indexDir))
  }

  private def spark(df: DataFrame): SparkSession = df.sparkSession

  /** BATCH exact-cosine top-k over each query's `nprobe` nearest inverted
    * lists — the IVF complement of [[Similarity.indexTopKBatch]],
    * completing the ANN matrix (brute/LSH/IVF × single/batch). Centroid
    * ranking stays a DataFrame op (queries × broadcast of the k centroid
    * rows, per-query window over k candidates), so the only driver-side
    * list is the DISTINCT probed cids (bounded by k, never by queries or
    * data) used as a literal partition filter on the lists scan — the
    * same planning-time pruning contract as [[topK]]. An equi-join on
    * `cid` then pairs each query with only its probed lists' vectors; a
    * vector lives in exactly one list and a query's probe cids are
    * distinct, so (qid, id) candidates are unique by construction and
    * exact cosine + a per-query window finish without dedup.
    */
  def topKBatch(spark: SparkSession, indexDir: String, queries: DataFrame,
                qidCol: String, qvecCol: String, k: Int, nprobe: Int = 4,
                excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))
    val cents = spark.read.parquet(centroidsDir(indexDir))
    val wc = Window.partitionBy("qid").orderBy(col("ccos").desc, col("cid"))
    // evaluated TWICE (the driver-side cid-list collect and the candidate
    // join), deliberately uncached: the plan is one narrow Q×k broadcast
    // scan + a window over ≤k candidates per query — recomputing it costs
    // less than building an InMemoryRelation of a crossJoin+window plan,
    // the SemDedup.assignRouted cache lesson (92 s cached vs ~4 s uncached
    // at 1 M; RUNTIME.md §6). Deterministic plan, so both evaluations
    // agree exactly.
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine_similarity(col("qvec"), col("cvec")))
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= nprobe)
      .select(col("qid"), col("qvec"), col("cid"))
    val cidList = probes.select("cid").distinct()
      .collect().map(_.getInt(0)).sorted
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id"))
    spark.read.parquet(listsDir(indexDir))
      .filter(col("cid").isin(cidList.map(Integer.valueOf).toSeq: _*))
      .join(probes, Seq("cid"))
      .filter(if (excludeSelf) col("id") =!= col("qid") else lit(true))
      .withColumn("cos", round(cosine_similarity(col("vec"), col("qvec")), 3))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rank"))
  }

  /** Exact cosine top-k over the `nprobe` nearest inverted lists.
    *
    * Probe selection is DETERMINISTIC under the cross-engine convention:
    * centroids rank by rounded-3 cosine (Spark's HALF_UP-on-shortest-
    * decimal law, `BigDecimal.valueOf`), ties to the smaller cid — so a
    * DuckDB oracle reading the materialized centroids reproduces the
    * probed list set exactly (the raw-double ranking it replaces had no
    * tie law at all: equal-cosine centroids probed in collect order).
    */
  def topK(spark: SparkSession, indexDir: String, queryVec: Array[Float],
           k: Int, nprobe: Int = 4): DataFrame = {
    val q = new GenericArrayData(queryVec)
    def r3(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue
    // centroid ranking is driver-side: k rows of dim floats, bounded
    val probeCids = spark.read.parquet(centroidsDir(indexDir))
      .select("cid", "cvec")
      .collect()
      .map(r => (r.getInt(0), new GenericArrayData(r.getSeq[Float](1).toArray)))
      .sortBy { case (cid, c) => (-r3(VectorKernels.cosine(q, c)), cid) }
      .take(nprobe).map(_._1)
    spark.read.parquet(listsDir(indexDir))
      .filter(col("cid").isin(probeCids.map(Integer.valueOf).toSeq: _*))
      .withColumn("cos",
        round(cosine_similarity(col("vec"), typedlit(queryVec.toSeq)), 3))
      .select(col("id"), col("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }
}
