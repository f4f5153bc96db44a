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

  /** The flat→routed assignment dispatch threshold shared by every
    * k-means surface ([[assign]]/[[assignScored]] here and
    * [[IvfIndex.assign]]): one constant, so the two surfaces cannot
    * silently pick different paths for the same geometry. */
  private[graft] val RoutedThreshold = 4096

  /** Assign each vector to its max-cosine centroid.
    *
    * `centroids` is `(cid int, cvec array<float>)` — k rows. Returns
    * `(id, cid)`. Dispatches on k: at or below `routedThreshold` the flat
    * path scans all k centroids per vector (one broadcast nested-loop +
    * a map-side-combinable `max_by` — the only shuffle is the N-row
    * aggregate); above it, assignment routes through a two-level
    * super-centroid hierarchy ([[assignRouted]]) so per-vector work is
    * O((1+nprobe)·√k) instead of O(k) — the scale seam for corpora past
    * ~10⁸ vectors, where k = N/2048 makes the flat scan quadratic in N.
    * Both paths share the same final argmax law (rounded-3 cosine, ties
    * to the SMALLER cid — the cross-engine oracle convention), so on
    * separated clusters the routed result equals the flat one exactly
    * and the dispatch is invisible to downstream [[report]] semantics.
    */
  def assign(embs: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame, routedThreshold: Int = RoutedThreshold,
             nprobe: Int = 8): DataFrame =
    assignScored(embs, idCol, vecCol, centroids, routedThreshold, nprobe)
      .select("id", "cid")

  /** [[assign]] keeping the winning cosine: `(id, cid, proto)` — `proto`
    * is the assignment's max rounded cosine (the prototypicality score of
    * [[prototypePrune]]). Same flat/routed dispatch as [[assign]].
    * Centroids are snapshotted through [[localizeCentroids]] first, so
    * the dispatch count and every downstream reference cost ONE
    * evaluation of the caller's centroid lineage total (r15 ADVICE: the
    * count() used to be paid per call ON TOP of the routed path's
    * 2·superIterations+3 lineage re-evaluations).
    */
  private[graft] def assignScored(embs: DataFrame, idCol: String,
                                  vecCol: String, centroids: DataFrame,
                                  routedThreshold: Int = RoutedThreshold,
                                  nprobe: Int = 8): DataFrame = {
    val (cents, k) = localizeCentroids(centroids)
    if (k <= routedThreshold)
      argmaxPacked(embs.select(col(idCol).as("id"), col(vecCol).as("v"))
        .crossJoin(broadcast(cents))
        .withColumn("cos", round(cosine_similarity(col("v"), col("cvec")), 3)))
    else assignRouted(embs, idCol, vecCol, cents, nprobe)
  }

  /** Snapshot a k-row `(cid, cvec)` relation into a driver-local
    * LocalRelation, returning it with its row count: ONE evaluation of
    * the input's lineage, after which the dispatch `count()`, the flat
    * path's broadcast, and [[assignRouted]]'s 2·`superIterations`+3
    * references are all free re-reads of local rows. The collect is
    * bounded by the same ceiling the assignment already carries — both
    * paths broadcast the k-row relation to every task, so a centroid set
    * that cannot sit on the driver could not be broadcast either (past
    * that ceiling, shuffle on `gid` per the [[assignRouted]] scaladoc —
    * and skip this snapshot).
    */
  private def localizeCentroids(centroids: DataFrame): (DataFrame, Int) = {
    val proj = centroids.select(col("cid"), col("cvec"))
    val rows = proj.collect()
    val local = centroids.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), proj.schema)
    (local, rows.length)
  }

  private val PackBase = 4294967296L // 2^32

  /** The assignment argmax — highest rounded-3 cosine, ties to the
    * SMALLEST cid — over a `(id, cid, cos)` candidate relation, as a
    * PRIMITIVE `max()`: the rounded cosine is an integer count of
    * thousandths in [-1000, 1000], so (cos·1000) and (2³¹−1−cid) pack
    * losslessly into one sortable long. A `max_by(cid, struct(cos,
    * -cid))` spells the same law but its struct buffer is not
    * hash-aggregable — Spark falls back to SortAggregate and SORTS the
    * entire candidate relation (N·k rows flat, N·nprobe·√k routed) per
    * assignment; the packed key keeps it a map-side-combinable
    * HashAggregate. Decode is exact: |key| < 2⁴³ so the divisions stay
    * inside double precision, and m/1000.0 is the correctly-rounded
    * double of the decimal — bit-equal to what `round(cos, 3)` produced
    * (both are the nearest double to the same 3-decimal value), so the
    * cross-engine oracle convention is unchanged.
    *
    * The output is DELIBERATELY skinny — `(id, cid, proto)`, never the
    * vector: any array-valued aggregate buffer (even `first(v)`) is
    * non-mutable, which silently demotes the whole aggregate from
    * HashAggregate to SortAggregate — re-importing the fallback wall
    * with the vector payload duplicated across every candidate row
    * (empirically confirmed: `max(key), first(v)` plans as
    * SortAggregate). Callers that need the vector join this skinny
    * result back to the corpus on `id` — one hash join of two N-row
    * relations, which at scale is strictly cheaper than sorting the
    * N·k (or N·nprobe·√k) candidate relation.
    */
  private[operators] def argmaxPacked(cand: DataFrame): DataFrame =
    cand
      // cos is round(x,3): ×1000 lands within 1e-10 of an integer; the
      // 0-decimal round snaps it exactly
      .withColumn("key",
        round(col("cos") * 1000, 0).cast("long") * PackBase +
          (lit(2147483647L) - col("cid")))
      .groupBy("id").agg(max("key").as("key"))
      .withColumn("s", pmod(col("key"), lit(PackBase)))
      .select(col("id"),
        (lit(2147483647L) - col("s")).cast("int").as("cid"),
        (((col("key") - col("s")) / PackBase).cast("long") / 1000.0)
          .as("proto"))

  /** Two-level routed assignment — the >10⁸-vector scale path.
    *
    * Flat assignment is N·k cosines; with k sized for constant cluster
    * occupancy (k = N/target, [[kForCorpus]]) that is quadratic in N.
    * The hierarchy restores near-linearity the way IVF probes do: cluster
    * the k CENTROIDS into g = ⌈√k⌉ super-centroids (a k-row problem —
    * the same deterministic seeded-Lloyd scheme as the IVF build, run
    * over centroids instead of vectors), route each vector to its
    * `nprobe` best supers (N·g cosines via one broadcast scan + the
    * bounded [[graft.functions.top_n_by]] aggregate — never a window
    * over the N·g relation), then argmax over only the routed supers'
    * member centroids (≈ nprobe·√k candidates via an equi-join on
    * `gid`). Per-vector work: g + nprobe·(k/g) ≈ (1+nprobe)·√k.
    *
    * Approximation contract: the true argmax centroid is missed only if
    * its super is outside the vector's top-`nprobe` routing — rare for
    * separated clusters (a vector near centroid c is near c's super too)
    * and measured in ScaleSmoke's `semroute` stage (planted corpora
    * assign exactly; a flat-assigned sample audits agreement). With
    * `nprobe >= g` every centroid is a candidate and the result equals
    * the flat path EXACTLY (identical rounded-3 / smaller-cid law) —
    * the spec's equivalence anchor.
    *
    * Scale notes: the centroid relation is snapshotted to a
    * LocalRelation on entry ([[localizeCentroids]]) — its
    * 2·`superIterations`+3 references in this body cost one evaluation
    * of the caller's lineage total; the membership join broadcasts the
    * k-row (gid, cid, cvec) relation, which holds to k ≈ 10⁷ at dim 64
    * — past the broadcast ceiling, drop the hint and let the join
    * shuffle on `gid` (both sides are gid-keyed; vectors carry ≤ nprobe
    * gid rows each). Do NOT `.cache()` the result to reuse it: building
    * an InMemoryRelation from this multi-stage plan under AQE measured
    * ~10× slower than the computation itself (92 s cached vs 9.7 s
    * AQE-off vs ~4 s uncached at 1 M×489 — the adaptive re-planning
    * inside a cache build serializes the pipeline); materialize through
    * a parquet write-and-read-back when the assignment is consumed more
    * than once, as ScaleSmoke's `semroute` stage does.
    */
  def assignRouted(embs: DataFrame, idCol: String, vecCol: String,
                   rawCentroids: DataFrame, nprobe: Int = 8,
                   superIterations: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.{top_n_by, vector_avg}
    // snapshot once: this body references the centroid relation
    // 2·superIterations+3 times (count, seeds, each Lloyd round's
    // membership, the final membership) — against a raw caller lineage
    // each reference would re-run it (when called via [[assignScored]]
    // the input is already local and this is a k-row local re-read)
    val (centroids, kCount) = localizeCentroids(rawCentroids)
    val g = math.max(1L, math.ceil(math.sqrt(
      kCount.toDouble)).toLong).toInt

    // -- level-2 build: deterministic mini-k-means over the k centroid
    // rows (seeds = smallest xxhash64(cid); Lloyd via vector_avg; empty
    // supers keep their previous position — the IvfIndex.build scheme)
    var supers = centroids
      .withColumn("h", xxhash64(col("cid")))
      .orderBy("h", "cid").limit(g)
      .withColumn("gid", row_number().over(Window.orderBy("h", "cid")) - 1)
      .select(col("gid"), col("cvec").as("gvec"))
    (0 until superIterations).foreach { _ =>
      val means = routeMembership(centroids, supers)
        .groupBy("gid").agg(vector_avg(col("cvec")).as("gvec"))
      supers = supers.as("old").join(means.as("new"), Seq("gid"), "left")
        .select(col("gid"),
          coalesce(col("new.gvec"), col("old.gvec")).as("gvec"))
    }
    val memb = routeMembership(centroids, supers)
    // Route vectors ONLY among supers that actually hold member
    // centroids: an empty super (kept at its stale position after a
    // memberless Lloyd round) can still WIN a vector's top-nprobe
    // routing cosines, and if all nprobe routed supers were empty the
    // membership join below would emit zero candidates for that vector —
    // silently dropping it from the assignment (a row the flat path can
    // never lose). Filtering supers to the live set makes every routed
    // super contribute >= 1 candidate, so the assignment is total by
    // construction.
    val liveSupers = supers.join(memb.select("gid").distinct(), "gid")

    // -- route: top-nprobe supers per vector, bounded map-side partials
    val np = math.min(nprobe, g)
    val routed = embs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(liveSupers))
      .withColumn("gcos", cosine_similarity(col("v"), col("gvec")))
      .groupBy("id")
      .agg(top_n_by(col("gid"), col("gcos"), np).as("gids"),
        first(col("v")).as("v"))

    // -- argmax over the routed supers' members: same law as flat
    argmaxPacked(
      routed.select(col("id"), col("v"), explode(col("gids")).as("gid"))
        .join(broadcast(memb), Seq("gid"))
        .withColumn("cos",
          round(cosine_similarity(col("v"), col("cvec")), 3)))
  }

  /** Each centroid's super assignment: `(gid, cid, cvec)` — raw-cosine
    * argmax (engine-internal routing, no cross-engine contract), ties to
    * the smaller gid. */
  private def routeMembership(centroids: DataFrame,
                              supers: DataFrame): DataFrame =
    centroids.crossJoin(broadcast(supers))
      .withColumn("gc", cosine_similarity(col("cvec"), col("gvec")))
      .groupBy("cid")
      .agg(max_by(col("gid"), struct(col("gc"), -col("gid"))).as("gid"),
        first(col("cvec")).as("cvec"))
      .select("gid", "cid", "cvec")

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
    * Plan shape: ONE [[assignScored]] pass computes assignment and
    * prototypicality together (`proto` IS the assignment's max cosine, so
    * no re-join against centroids — and past `routedThreshold` centroids
    * it routes through the [[assignRouted]] hierarchy like [[assign]]),
    * one N-row aggregate, and one cid-partitioned window for the
    * per-cluster rank — clusters are the unit of parallelism, same skew
    * rule as [[pairs]] (hot cluster ⇒ raise k, never salt). Determinism:
    * rounded-3 cosines, assignment ties to the smaller cid, rank ties to
    * the smaller id, and the drop count `floor(pruneFrac · |cluster|)`
    * is an IEEE double multiply + floor — identical in any engine.
    */
  def prototypePrune(embs: DataFrame, idCol: String, vecCol: String,
                     centroids: DataFrame, pruneFrac: Double): DataFrame = {
    require(pruneFrac >= 0.0 && pruneFrac < 1.0,
      "need 0 <= pruneFrac < 1")
    import org.apache.spark.sql.expressions.Window
    val scored = assignScored(embs, idCol, vecCol, centroids)
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
    * assignment grows quadratically — which is why [[assign]] switches
    * to the [[assignRouted]] √k super-centroid hierarchy past
    * `routedThreshold` centroids; ScaleSmoke's `semroute` stage measures
    * both paths and audits their agreement.
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
