package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.cosine_similarity

/** SemDeDup — semantic deduplication scoped to embedding clusters
  * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication", arXiv:2303.09540).
  *
  * The insight that makes corpus-wide semantic dedup tractable: near-dups
  * land in the SAME embedding cluster, so cluster the corpus first (k
  * centroids) and compare pairs only WITHIN clusters. The quadratic term
  * drops from O(N²) to O(Σ|cluster|²) — bounded by design, because k is
  * chosen to hold the expected cluster size (N/k) constant as the corpus
  * grows. At 100 TB the knob that matters is k: size it so N/k vectors fit
  * one task's working set (the paper runs 50 k clusters over 5 B images);
  * the within-cluster join below shuffles on `cid`, so clusters are the
  * unit of parallelism and no task ever sees two clusters.
  *
  * Relationship to [[Dedup.embeddingDupPairs]]: that operator finds ALL
  * corpus near-dup pairs via hyperplane LSH (recall is probabilistic,
  * tunable to ~1); SemDeDup trades a different axis — pairs are exact
  * within a cluster and MISSED across cluster boundaries (the paper
  * accepts this: semantic twins that land in different k-means cells are
  * rare and get rarer as k shrinks cells around modes). Use LSH when the
  * contract is "find every pair above t"; use SemDeDup when the contract
  * is "cheaply thin dense semantic neighborhoods before training".
  *
  * Determinism: assignment ties (two centroids at the same rounded cosine)
  * break toward the SMALLER cid, and cosines are rounded to 3 decimals
  * before any comparison — the same cross-engine convention as the
  * embedding-dedup oracles, so a DuckDB oracle reproduces every stage.
  */
object SemDedup {

  /** Assign each vector to its max-cosine centroid.
    *
    * `centroids` is `(cid int, cvec array<float>)` — k rows, broadcast.
    * Returns `(id, cid)`. One broadcast nested-loop over k rows + a
    * map-side-combinable `max_by` — the only shuffle is the N-row
    * aggregate (same shape as the IVF build's assignment, but with the
    * rounded-cosine / smaller-cid tie rule the cross-engine oracle needs).
    */
  def assign(embs: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame): DataFrame =
    embs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(centroids))
      .withColumn("cos", round(cosine_similarity(col("v"), col("cvec")), 3))
      .groupBy("id")
      // struct max: highest cos first, then highest -cid = SMALLEST cid
      .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("cid"))

  /** Within-cluster near-dup pairs: `(id_a, id_b, cid, cos)` with
    * `id_a < id_b`, both in cluster `cid`, and rounded cosine ≥ `eps`.
    *
    * The self-join keys on `cid` — each cluster's vectors co-locate in one
    * shuffle partition and the pairwise scan is |cluster|² cosines, never
    * corpus². Skew note: with k sized for constant cluster occupancy this
    * is balanced; a pathologically hot cluster is the signal to raise k
    * (re-cluster), not to salt — splitting a cluster across tasks would
    * change which pairs are compared.
    */
  def pairs(embs: DataFrame, idCol: String, vecCol: String,
            assignments: DataFrame, eps: Double): DataFrame = {
    val av = embs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(assignments, "id")
    av.select(col("id").as("id_a"), col("v").as("v_a"), col("cid"))
      .join(av.select(col("id").as("id_b"), col("v").as("v_b"), col("cid")),
        Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine_similarity(col("v_a"), col("v_b")), 3))
      .filter(col("cos") >= eps)
      .select(col("id_a"), col("id_b"), col("cid"), col("cos"))
  }

  /** The full SemDeDup report: `(id, cid, keep)` for every vector.
    *
    * Within each cluster, vectors whose rounded cosine ≥ `eps` form
    * near-dup groups (connected components over the within-cluster pair
    * graph — transitive, like the paper's greedy sweep); each group KEEPS
    * exactly its minimum-id member and drops the rest. Vectors with no
    * ≥ `eps` neighbor in their cluster keep themselves. The CC runs on
    * [[Dedup.dupClusters]] (pointer-doubling min-label propagation);
    * components cannot span clusters because no cross-cluster pair exists.
    */
  def report(embs: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame, eps: Double): DataFrame = {
    val asg = assign(embs, idCol, vecCol, centroids)
    val p = pairs(embs, idCol, vecCol, asg, eps)
    val ids = embs.select(col(idCol).as("id"))
    Dedup.dupClusters(p.select("id_a", "id_b"), ids, "id")
      .withColumnRenamed("cluster", "grp")
      .join(asg, "id")
      .select(col("id"), col("cid"), (col("grp") === col("id")).as("keep"))
  }

  /** Prototypicality pruning (Sorscher et al. 2022, "Beyond neural
    * scaling laws: beating power law scaling via data pruning",
    * arXiv:2206.14486 — the SSL-prototypes metric; run after [[report]]
    * it is the second stage of D4, Tirumala et al. 2023,
    * arXiv:2308.12284): score each example by the cosine to its own
    * cluster's centroid ("prototypicality"), then within each cluster
    * DROP the `pruneFrac` most prototypical examples — the redundant
    * core near the mode, which abundant-data training learns from least
    * — and keep the harder tail. Returns `(id, cid, proto, keep)`.
    *
    * Plan shape: ONE broadcast-k scan computes assignment and
    * prototypicality together (`proto` IS the assignment's max cosine, so
    * no re-join against centroids), one N-row aggregate, and one
    * cid-partitioned window for the per-cluster rank — clusters are the
    * unit of parallelism, same skew rule as [[pairs]] (hot cluster ⇒
    * raise k, never salt). Determinism: rounded-3 cosines, assignment
    * ties to the smaller cid, rank ties to the smaller id, and the drop
    * count `floor(pruneFrac · |cluster|)` is an IEEE double multiply +
    * floor — identical in any engine.
    */
  def prototypePrune(embs: DataFrame, idCol: String, vecCol: String,
                     centroids: DataFrame, pruneFrac: Double): DataFrame = {
    require(pruneFrac >= 0.0 && pruneFrac < 1.0,
      "need 0 <= pruneFrac < 1")
    import org.apache.spark.sql.expressions.Window
    val scored = embs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(centroids))
      .withColumn("cos", round(cosine_similarity(col("v"), col("cvec")), 3))
      .groupBy("id")
      .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("cid"),
        max("cos").as("proto"))
    val wRank = Window.partitionBy("cid").orderBy(col("proto").desc, col("id"))
    scored.withColumn("rn", row_number().over(wRank))
      .withColumn("csize", count(lit(1)).over(Window.partitionBy("cid")))
      .select(col("id"), col("cid"), col("proto"),
        (col("rn") > floor(lit(pruneFrac) * col("csize"))).as("keep"))
  }

  /** Cluster count holding the expected cluster occupancy N/k at
    * `targetClusterSize` — the paper's contract made a default (the
    * [[Dedup.resolveLshParams]] auto-sizing precedent). SemDeDup itself
    * runs 50 k clusters over 5 B images (≈100 k vectors/cluster), sized
    * for a GPU pair scan; this CPU engine defaults to ~2048, keeping one
    * cluster's pair scan at ≈2 M cosines — a seconds-scale task — while
    * the quadratic term stays O(N·target). The OTHER term this exposes:
    * brute assignment is N·k cosines, so k grows linearly with N and
    * assignment grows quadratically — past ~10⁸ vectors, assign against
    * a two-level centroid hierarchy (route via √k super-centroids) before
    * the within-cell argmax; the 1 M-vector ScaleSmoke stage measures
    * where the flat default stands.
    */
  private[graft] def kForCorpus(n: => Long,
                                targetClusterSize: Long = 2048L): Int =
    math.min(Int.MaxValue.toLong,
      math.max(1L, (n + targetClusterSize - 1) / targetClusterSize)).toInt

  /** [[report]] with LEARNED centroids: deterministic k-means via the IVF
    * build (seeded by smallest `xxhash64(id)`, Lloyd-refined), memoized
    * through [[IndexCatalog]] so re-runs over the same corpus version pay
    * the clustering once. `inputPaths` fingerprint the corpus for the
    * catalog key (same contract as the ANN index queries). `k <= 0`
    * (the default) auto-sizes via [[kForCorpus]] — one count pass, paid
    * only on the auto path.
    */
  def reportKMeans(embs: DataFrame, idCol: String, vecCol: String,
                   inputPaths: Seq[String],
                   k: Int = 0, iterations: Int = 2,
                   eps: Double = 0.4): DataFrame = {
    val s = embs.sparkSession
    val kk = if (k > 0) k else kForCorpus(embs.count())
    val indexDir = IndexCatalog.ensure(s, "semdedup-kmeans", inputPaths,
      s"k=$kk,it=$iterations")(dir =>
      IvfIndex.build(embs, idCol, vecCol, dir, kk, iterations))
    val centroids = s.read.parquet(s"$indexDir/centroids")
    report(embs, idCol, vecCol, centroids, eps)
  }
}
