package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{cosine_similarity, top_n_by, top_n_by_scored}

/** Corpus-wide k-nearest-neighbor graph — the building block of
  * graph-shaped curation (D4-style dedup-then-diversify, agglomerative
  * topic clustering, neighborhood-based quality propagation): for EVERY
  * vector, its top-k cosine neighbors. Exact all-pairs is O(N²) and only
  * exists as a verification baseline ([[Similarity.bruteForceTopKBatch]]
  * over a sampled query set); the graph itself is built cluster-scoped,
  * the [[SemDedup.pairs]] contract — candidates are vectors sharing at
  * least one of each vector's `nprobe` nearest centroids, so the pairwise
  * scan is Σ|cluster|²·nprobe², never corpus², and clusters are the unit
  * of parallelism (hot cluster ⇒ raise k via [[SemDedup.kForCorpus]],
  * never salt).
  *
  * Multi-probe assignment is ONE broadcast-centroid scan folded through
  * the bounded [[graft.functions.TopNBy]] aggregate: partials carry at
  * most `nprobe` (cid, ccos) entries per vector per task and combine
  * map-side, so the shuffle is N·nprobe skinny rows — an N·k-row window
  * would shuffle the whole crossJoin, and the previous
  * argmax-with-exclusion loop paid one full cosine scan PER PROBE (plus
  * each pass's lineage re-derived by every later pass and by both sides
  * of the candidate self-join: ~10 scans at nprobe=4, measured 11.8 s →
  * 4.4 s at sf0.1 from this rewrite alone).
  * Boundary-recall is the standard IVF trade: a true neighbor in a
  * cluster none of the vector's probes touch is missed — quantified
  * against the exact baseline by the `ns_ann_knn_recall` audit rather
  * than asserted away.
  *
  * Determinism (oracle rules): rounded-3 cosines, centroid ties to the
  * smaller cid, neighbor ties to the smaller id — the graph is a pure
  * function of (embeddings, centroids).
  */
object KnnGraph {

  /** `(id, nbr, cos, rank)`, `rank <= k` per id (fewer if the probed
    * clusters hold fewer candidates). `centroids` is `(cid, cvec)`,
    * broadcast.
    */
  def build(embs: DataFrame, idCol: String, vecCol: String,
            centroids: DataFrame, k: Int, nprobe: Int = 2): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    require(nprobe > 0, s"need nprobe > 0, got $nprobe")
    val base = embs.select(col(idCol).as("id"), col(vecCol).as("v"))

    // nprobe nearest centroids per vector in one scan: bounded top-n
    // partials (≤ nprobe entries per id per task) combine map-side, so
    // the shuffle is N·nprobe rows. Ties break to the smaller cid inside
    // the aggregate — identical to successive argmax-with-exclusion over
    // max_by(cid, struct(ccos, -cid)), since top-n under a total order
    // IS n successive argmaxes.
    val taken = base.crossJoin(broadcast(centroids))
      .select(col("id"), col("cid"),
        round(cosine_similarity(col("v"), col("cvec")), 3).as("ccos"))
      .groupBy("id")
      .agg(top_n_by(col("cid"), col("ccos"), nprobe).as("cids"))
      .select(col("id"), explode(col("cids")).as("cid"))

    // skinny candidate ids first (a pair sharing several probed clusters
    // surfaces once), vectors joined back after the distinct — the float
    // arrays never ride the candidate shuffle. Score each UNDIRECTED pair
    // once (a < b) and mirror after: halves the cosine work and, more
    // importantly, halves the vector payload the verify joins ship.
    val pairIds = taken.select(col("id").as("a"), col("cid"))
      .join(taken.select(col("id").as("b"), col("cid")), Seq("cid"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val scored = pairIds
      .join(base.select(col("id").as("a"), col("v").as("va")), "a")
      .join(base.select(col("id").as("b"), col("v").as("vb")), "b")
      .select(col("a"), col("b"),
        round(cosine_similarity(col("va"), col("vb")), 3).as("cos"))
    // mirror via self-union: the branches are identical subplans, so the
    // candidate shuffles are planned ONCE (ReusedExchange) — A/B-measured
    // against an explode-both-directions single pass, which re-scores
    // nothing but breaks the reuse boundary and ran ~30% slower
    val directed = scored.select(col("a").as("id"), col("b").as("nbr"),
        col("cos"))
      .unionByName(scored.select(col("b").as("id"), col("a").as("nbr"),
        col("cos")))
    // final per-id rank through the bounded top-n aggregate, NOT a window:
    // a row_number window would shuffle every candidate row (N × per-id
    // candidates — the shape that filled a disk once in intDotTopKBatch),
    // where these partials carry ≤ k (nbr, cos) entries per id per task
    // and combine map-side, so the shuffle is N·k. Identical total order
    // (cos desc, nbr asc) ⇒ identical rows; rank = posexplode pos + 1.
    directed.groupBy("id")
      .agg(top_n_by_scored(col("nbr"), col("cos"), k).as("nn"))
      .select(col("id"), posexplode(col("nn")).as(Seq("pos", "e")))
      .select(col("id"), col("e.v").as("nbr"), col("e.s").as("cos"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Neighborhood score propagation over a `(id, nbr, cos)` graph —
    * label spreading (Zhou et al. NIPS'04) as a curation primitive: push
    * sparse quality/classifier scores onto embedding neighbors, so docs
    * that LOOK like high-quality docs inherit credit before a threshold
    * filter runs. `s_{t+1}(i) = [(1-α)·s_0(i) + α·avg_w(s_t(nbrs))]`,
    * restart term anchored at the seed (the PPR flavor), `α =
    * alphaNum/alphaDen`.
    *
    * ALL-INTEGER arithmetic, so the trajectory is bit-replicable in SQL
    * (the exact-rational HALF_UP convention): scores are micro-units
    * (`s0` a BIGINT in [0, 1e6]), edge weights milli-cosines
    * (`round(cos·1000)`, non-positive edges dropped), and every division
    * is the rational HALF_UP `(2N + D) div 2D`. Per iteration the plan is
    * one N·k-row join shuffle (neighbor scores) + one groupBy(id) —
    * nothing corpus-quadratic; `iters` is small by contract (the
    * spreading fixpoint is geometric in α).
    *
    * Nodes with no positive-weight neighbors keep their current score
    * (the left-join fallback), so isolated docs pass through unchanged.
    */
  def propagate(graph: DataFrame, seeds: DataFrame, idCol: String,
                scoreCol: String, alphaNum: Int = 4, alphaDen: Int = 5,
                iters: Int = 2): DataFrame =
    propagateWeighted(
      graph.select(col("id"), col("nbr"),
          round(col("cos") * 1000, 0).cast("long").as("w"))
        .filter(col("w") > 0),
      seeds, idCol, scoreCol, alphaNum, alphaDen, iters)

  /** [[propagate]] over PRE-DERIVED integer edge weights `(id, nbr, w)`,
    * `w > 0` — the fully integer-exact entry point: when the caller
    * derives `w` from an exact integer quantity (e.g. the
    * [[Similarity.intDot]] fixed-point dot product), NO float exists
    * anywhere in the trajectory and the whole computation is
    * bit-replicable on any engine. The cosine wrapper above keeps the
    * convenient `(id, nbr, cos)` shape for graphs whose weights are
    * display/threshold values rather than hash-audited state.
    *
    * Seed scores MUST be ≥ 0 (same for [[pageRankFrom]] restarts): the
    * HALF_UP grid rule `(2·a·b + d) div (2·d)` is stated for
    * nonnegative flows, and on a negative numerator Spark's `div`
    * (truncates toward zero) and a SQL oracle's `//` (floors) disagree
    * by one — a negative seed would silently de-oracle the trajectory,
    * not error.
    */
  def propagateWeighted(edges: DataFrame, seeds: DataFrame, idCol: String,
                        scoreCol: String, alphaNum: Int = 4,
                        alphaDen: Int = 5, iters: Int = 2): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(alphaNum >= 0 && alphaDen > 0 && alphaNum <= alphaDen,
      s"alpha $alphaNum/$alphaDen outside [0,1]")
    var cur = seeds.select(col(idCol).as("id"),
        col(scoreCol).cast("long").as("s0"))
      .withColumn("s", col("s0"))
    for (_ <- 1 to iters) {
      val agg = edges
        .join(cur.select(col("id").as("nbr"), col("s").as("sn")), "nbr")
        .groupBy("id")
        .agg(sum(col("w") * col("sn")).as("num"), sum(col("w")).as("den"))
      cur = cur.join(agg, Seq("id"), "left")
        .withColumn("avg", when(col("den").isNotNull,
          expr("(2 * num + den) div (2 * den)")).otherwise(col("s")))
        .withColumn("s", expr(
          s"(2 * (${alphaDen - alphaNum} * s0 + $alphaNum * avg) + " +
            s"$alphaDen) div (2 * $alphaDen)"))
        .drop("num", "den", "avg")
        // cur is consumed TWICE next iteration (neighbor join + restart
        // join), so without a materialization the lineage re-executes
        // ~2^t times (measured: 3 iters at 1 M nodes 17 s -> 9 s).
        // localCheckpoint truncates to the 3-column (id, s0, s) rows —
        // the iterative-algorithm contract, same as BPE's fold rewrite.
        .localCheckpoint()
    }
    cur
  }

  /** Weighted PageRank over `(id, nbr, w)` integer edges (`w > 0`),
    * ALL-INTEGER like [[propagateWeighted]] — centrality-based data
    * valuation on the KNN graph (a doc whose neighborhood keeps pointing
    * back at it is a prototype; leaves are outliers), the importance
    * prior behind graph-ranked curation the way [[propagateWeighted]] is
    * the label-spreading posterior.
    *
    * `s_{t+1}(i) = (1-d)·base + d·Σ_{j→i} s_t(j)·w_{ji}/W_j`, `W_j` the
    * total out-weight of `j`, `d = dampNum/dampDen`. Fixed-point
    * conventions (the grid rule): scores are micro-units starting at
    * `base`; each edge's flow is the rational HALF_UP
    * `(2·s·w + W) div (2·W)`; the damped update is HALF_UP over
    * `dampDen`. Mass on DANGLING nodes (no out-edges) is dropped, not
    * redistributed, BY DEFAULT — the truncated variant keeps the
    * trajectory a pure local function of (edges, nodes) and is a
    * documented contract, not an approximation; isolated nodes settle at
    * `(1-d)·base` + inflow only. `conserveDangling = true` selects the
    * classic mass-conserving formulation instead — uniform
    * redistribution of the dangling sum, one extra global 1-row
    * aggregate per iteration (see [[pageRankFrom]] for the grid rule).
    *
    * Per iteration: one join of edges with the score vector on the
    * SOURCE id (N·k rows, k bounded) + one groupBy(nbr) — shuffle is
    * edge-count-shaped, nothing corpus-quadratic; out-weights are
    * computed ONCE before the loop. `iters` small by contract
    * (geometric damping). Overflow headroom: `2·s·w` needs
    * `s·w < 2^62`; with milli-weights (`w ≤ ~1000`) and micro-unit
    * scores that holds until a single node's score exceeds ~4.6e15 —
    * inflow concentration of ~10^9 nodes' full mass into one, far past
    * any bounded-degree KNN graph.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, idCol: String,
               dampNum: Int = 85, dampDen: Int = 100, iters: Int = 2,
               base: Long = 1000000L,
               conserveDangling: Boolean = false): DataFrame = {
    require(base > 0, s"need base > 0, got $base")
    pageRankFrom(edges,
      nodes.select(col(idCol), lit(base).as("__r")), idCol, "__r",
      dampNum, dampDen, iters, conserveDangling)
  }

  /** PERSONALIZED [[pageRank]]: the restart mass is a per-node vector
    * instead of the uniform `base` — concentrate it on a trusted seed
    * set (curated docs, a golden eval slice) and the scores become
    * random-walk-with-restart proximity TO THE SEEDS, the
    * "find more like my best data" selection signal (vs uniform
    * PageRank's global prototypicality). `s_0 = r`,
    * `s_{t+1}(i) = (1-d)·r(i) + d·Σ_{j→i} s_t(j)·w_{ji}/W_j` — same
    * integer conventions, same per-iteration plan, and uniform `r`
    * recovers [[pageRank]] exactly (the delegation above). Restart
    * masses MUST be ≥ 0 — see [[propagateWeighted]]'s seed contract
    * (truncating `div` vs flooring `//` diverge on negatives).
    *
    * `conserveDangling = true` switches from the truncated contract to
    * the MASS-CONSERVING classic formulation: each iteration, the total
    * score sitting on dangling nodes (no out-edges) is redistributed
    * UNIFORMLY over all N nodes inside the damped term —
    * `s_{t+1}(i) = (1-d)·r(i) + d·(Σ_{j→i} flow_ji + HALF_UP(D_t/N))`
    * with `D_t = Σ_{dangling j} s_t(j)`. Uniform (not restart-weighted)
    * redistribution even in the personalized case, matching the
    * canonical PageRank statement. Cost over the truncated variant: one
    * global 1-row dangling-sum aggregate per iteration, attached via the
    * repo's broadcast-1-row idiom — an all-node scan, no extra shuffle
    * shape; the dangling-node set itself is one loop-invariant anti-join
    * against the out-weight relation. Everything stays on the integer
    * grid (share is rational HALF_UP), so the trajectory remains
    * bit-oracle-able.
    */
  def pageRankFrom(edges: DataFrame, restarts: DataFrame, idCol: String,
                   restartCol: String, dampNum: Int = 85,
                   dampDen: Int = 100, iters: Int = 2,
                   conserveDangling: Boolean = false): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(dampNum >= 0 && dampDen > 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen outside [0,1]")
    val outw = edges.groupBy("id").agg(sum("w").as("wt"))
    val e = edges.join(outw, "id")
    val nodes = restarts.select(col(idCol).as("id"),
      col(restartCol).cast("long").as("r"))
    // N is loop-invariant; only needed (and only computed) when
    // conserving — one bounded driver value, the idiom the 1-row
    // attachments already follow.
    lazy val nNodes: Long = nodes.count()
    var cur = nodes.withColumn("s", col("r"))
    for (_ <- 1 to iters) {
      val inflow = e
        .join(cur.select(col("id"), col("s")), "id")
        .select(col("nbr"),
          expr("(2 * s * w + wt) div (2 * wt)").as("flow"))
        .groupBy("nbr").agg(sum("flow").as("infl"))
      val withInfl = nodes
        .join(inflow.withColumnRenamed("nbr", "id"), Seq("id"), "left")
      val scored =
        if (!conserveDangling) {
          withInfl.withColumn("s", expr(
            s"(2 * (${dampDen - dampNum} * r + " +
              s"$dampNum * coalesce(infl, 0L)) + $dampDen) div " +
              s"(2 * $dampDen)"))
        } else {
          require(nNodes > 0, "conserveDangling needs a non-empty node set")
          // D_t = score mass on nodes with no out-edges; share = its
          // uniform per-node HALF_UP slice. One 1-row aggregate,
          // broadcast back — no per-node shuffle added.
          val share = cur.join(outw, Seq("id"), "left_anti")
            .agg(coalesce(sum("s"), lit(0L)).as("__dm"))
            .select(expr(s"(2 * __dm + $nNodes) div (2 * $nNodes)")
              .as("__share"))
          withInfl.crossJoin(broadcast(share))
            .withColumn("s", expr(
              s"(2 * (${dampDen - dampNum} * r + " +
                s"$dampNum * (coalesce(infl, 0L) + __share)) + " +
                s"$dampDen) div (2 * $dampDen)"))
            .drop("__share")
        }
      cur = scored
        .drop("infl")
        // same lineage-truncation contract as propagateWeighted: cur is
        // the loop-carried state, keep the plan per-iteration-sized
        .localCheckpoint()
    }
    cur.drop("r")
  }

  /** HITS hubs-and-authorities (Kleinberg '99) over `(id, nbr, w)`
    * integer edges — the DIRECTION-AWARE complement of [[pageRank]]: on
    * an asymmetric KNN graph (i ranks j highly, j doesn't rank i) a good
    * hub POINTS AT prototypes without being one, and a good authority is
    * pointed at — retrieval-seed selection wants authorities, coverage
    * sampling wants hubs, and one score cannot say both.
    *
    * All-integer mutual recursion on the micro-unit grid:
    * `a'(i) = Σ_{j→i} h(j)·w` then renormalized to max = `base` via
    * HALF_UP `(2·a·base + max) div (2·max)`; `h'(j) = Σ_{j→i} a'(i)·w`,
    * same renorm. The max-renorm (not L2) keeps the trajectory integer —
    * the global max is ONE 1-row aggregate broadcast back per half-step
    * (the repo's 1-row attachment idiom), which any engine folds
    * identically because it's a max, not a sum of doubles. Nodes outside
    * the edge relation hold score 0 after the first half-step (they
    * receive and send nothing).
    *
    * Overflow: `a ≤ indeg·h_max·w_max ≤ k·base·1000 ≈ 2^43` at k=100
    * before renorm; `2·a·base` then needs ~2^63 — so `base` stays 1e6
    * and weights milli by contract (documented, `require`d loosely via
    * base).
    */
  def hits(edges: DataFrame, nodes: DataFrame, idCol: String,
           iters: Int = 2, base: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(base > 0 && base <= 1000000000L,
      s"base outside (0, 1e9], got $base")
    val ids = nodes.select(col(idCol).as("id"))
    def renorm(df: DataFrame, c: String): DataFrame = {
      val mx = df.agg(max(col(c)).as("mx"))
      // guard: an all-zero half-step (possible on an empty edge set)
      // divides by zero otherwise; keep zeros as zeros
      df.crossJoin(broadcast(mx))
        .withColumn(c, when(col("mx") > 0,
          expr(s"(2 * $c * ${base}L + mx) div (2 * mx)"))
          .otherwise(lit(0L)))
        .drop("mx")
    }
    var hub = ids.withColumn("h", lit(base))
    var auth = ids.withColumn("a", lit(0L))
    for (_ <- 1 to iters) {
      auth = renorm(
        ids.join(
          edges.join(hub.withColumnRenamed("id", "src")
              .withColumnRenamed("h", "hs"),
            edges("id") === col("src"))
            .groupBy(col("nbr").as("id")).agg(sum(expr("hs * w")).as("a")),
          Seq("id"), "left")
          .withColumn("a", coalesce(col("a"), lit(0L))), "a")
        .localCheckpoint()
      hub = renorm(
        ids.join(
          edges.join(auth.withColumnRenamed("id", "dst")
              .withColumnRenamed("a", "as_"),
            edges("nbr") === col("dst"))
            .groupBy(col("id")).agg(sum(expr("as_ * w")).as("h")),
          Seq("id"), "left")
          .withColumn("h", coalesce(col("h"), lit(0L))), "h")
        .localCheckpoint()
    }
    hub.join(auth, "id")
  }

  /** Undirected simple edge set `(a, b)` with `a < b` of a directed
    * `(id, nbr, …)` graph — self-loops dropped, the two directions of a
    * mutual pair collapsed to one row. The neighborhood-structure
    * primitive [[triangles]] and [[kcorePeel]] share.
    */
  def undirect(edges: DataFrame): DataFrame =
    edges.filter(col("id") =!= col("nbr"))
      .select(least(col("id"), col("nbr")).as("a"),
        greatest(col("id"), col("nbr")).as("b"))
      .distinct()

  /** Per-node triangle count and local clustering coefficient over the
    * UNDIRECTED simple graph of `edges` — neighborhood-density as a
    * curation signal: a doc whose neighbors are also each other's
    * neighbors sits inside a tight near-duplicate/topic clump (candidate
    * for diversity pruning); a triangle-free node bridges clumps or is an
    * outlier. Classic compact-forward enumeration (Schank & Wagner '05):
    * each triangle is materialized ONCE as its ordered corner triple
    * `a < b < c` — wedges `(a<b<c)` from `(a,b)⋈(b,c)` closed by `(a,c)`
    * — so the join volume is Σ_v deg(v)², bounded by N·(2k)² on a k-NN
    * graph, never corpus². Both joins are plain hash equi-joins that
    * shuffle on the shared endpoint.
    *
    * Output `(id, deg, tri, lcc_micro)` for every node in `nodes`:
    * `deg` = undirected degree, `tri` = incident triangles, `lcc_micro`
    * = HALF_UP micro-unit local clustering coefficient
    * `1e6 · 2·tri / (deg·(deg−1))` (0 when `deg < 2`) — all-integer on
    * the repo's rational-HALF_UP grid, so the result is bit-replicable
    * in any engine. Overflow: `2·(2e6·tri)` needs `tri < 2^61/4e6`
    * (~5.8e11 triangles PER NODE) — unreachable on bounded-degree
    * graphs.
    */
  def triangles(edges: DataFrame, nodes: DataFrame,
                idCol: String): DataFrame = {
    val und = undirect(edges)
    val deg = und.select(col("a").as("id"))
      .unionByName(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val wedges = und.join(
      und.select(col("a").as("b"), col("b").as("c")), "b")
    val tris = wedges.join(und.select(col("a"), col("b").as("c")),
        Seq("a", "c"))
      .select("a", "b", "c")
    val perNode = tris.select(col("a").as("id"))
      .unionByName(tris.select(col("b").as("id")))
      .unionByName(tris.select(col("c").as("id")))
      .groupBy("id").agg(count(lit(1)).as("tri"))
    nodes.select(col(idCol).as("id"))
      .join(deg, Seq("id"), "left")
      .join(perNode, Seq("id"), "left")
      .na.fill(0L, Seq("deg", "tri"))
      .withColumn("lcc_micro", when(col("deg") >= 2,
        expr("(2 * 2000000 * tri + deg * (deg - 1)) div " +
          "(2 * deg * (deg - 1))"))
        .otherwise(lit(0L)))
  }

  /** Synchronous weighted label propagation (Raghavan et al. '07, the
    * deterministic synchronous variant) over `(id, nbr, w)` integer
    * edges — community detection on the k-NN graph: labels start at the
    * node id; each round every node adopts the label with the LARGEST
    * total edge weight among its out-neighbors (its k nearest — the
    * natural "vote of my nearest neighbors" on an asymmetric KNN
    * relation), ties to the smaller label, neighbor-less nodes keep
    * their label. Topic-granular grouping between the two extremes the
    * engine already has: exact/near-dup clusters (connected components —
    * too fine) and k-means cells (fixed k — shape-blind).
    *
    * All-integer and order-free (a weight SUM per candidate label + an
    * argmax under a total order), so the full `iters`-round trajectory
    * is bit-replicable in SQL. Per round: one N·k join (labels onto edge
    * targets) + one groupBy(id, lbl) + one per-id argmax window — all
    * edge-count-shaped; loop-carried state is localCheckpoint-truncated
    * like [[propagateWeighted]]. `iters` small by contract: label fronts
    * move one hop per round, and curation wants the 2-3-round
    * neighborhood consensus, not the (oscillation-prone) fixpoint.
    */
  def labelPropagation(edges: DataFrame, nodes: DataFrame, idCol: String,
                       iters: Int = 3): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val ids = nodes.select(col(idCol).as("id"))
    var lab = ids.withColumn("lbl", col("id"))
    for (_ <- 1 to iters) {
      val votes = edges
        .join(lab.select(col("id").as("nbr"), col("lbl")), "nbr")
        .groupBy("id", "lbl").agg(sum("w").as("ws"))
      val win = Window.partitionBy("id")
        .orderBy(col("ws").desc, col("lbl"))
      val best = votes.withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1)
        .select(col("id"), col("lbl").as("nl"))
      lab = lab.join(best, Seq("id"), "left")
        .withColumn("lbl", coalesce(col("nl"), col("lbl")))
        .drop("nl")
        .localCheckpoint()
    }
    lab
  }

  /** Bounded synchronous k-core peeling over the UNDIRECTED simple graph
    * of `edges`: `rounds` sweeps of "drop every node whose degree among
    * survivors is < k", then the survivors with their in-core degrees —
    * the dense-backbone extractor (nodes a curation pass can trust to be
    * deeply embedded in their topic) complementing [[triangles]]'s local
    * view. The FIXED round count is the contract, not an approximation
    * cap: each sweep is one degree aggregate over the filtered edge set,
    * the trajectory is a pure function of (edges, k, rounds), and
    * convergence at a given corpus is checked by equality with
    * `rounds+1` (asserted in the spec at the query's parameters) —
    * loop-until-fixpoint would make the ORACLE's unroll depth
    * data-dependent.
    *
    * Per round: two semi-join filters of the edge set against the
    * survivor list (broadcast-able once survivors shrink) + one degree
    * groupBy — edge-count-shaped. A node outside the edge relation has
    * degree 0 and is peeled in round 1 (for any k ≥ 1).
    */
  def kcorePeel(edges: DataFrame, nodes: DataFrame, idCol: String,
                k: Int, rounds: Int = 3): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val und = undirect(edges)
    def coreDeg(alive: DataFrame): DataFrame = {
      val live = und
        .join(alive.select(col("id").as("a")), "a")
        .join(alive.select(col("id").as("b")), "b")
      live.select(col("a").as("id"))
        .unionByName(live.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
    }
    var alive = nodes.select(col(idCol).as("id"))
    for (_ <- 1 to rounds) {
      alive = coreDeg(alive).filter(col("deg") >= k)
        .select("id").localCheckpoint()
    }
    alive.join(coreDeg(alive), Seq("id"), "left")
      .na.fill(0L, Seq("deg"))
  }

  /** Onion-decomposition peel layers (Hébert-Dufresne et al. '16) of the
    * k-peel process: `(id, layer)` where `layer` = the sweep (1-based)
    * at which the node fell out of the [[kcorePeel]] iteration, 0 if
    * still alive after `rounds`. The INFORMATIVE signal when the graph
    * has no non-trivial stable core — exactly the k-NN case: every node
    * has out-degree k, so the k-core is the whole graph, the (k+1)-core
    * is typically EMPTY (the peel cascades), and coreness is the
    * constant k; the cascade's per-node DEPTH is what actually orders
    * nodes from periphery (layer 1: nobody else ranks them a neighbor)
    * to structural center (high layer / survivor). Same per-sweep plan
    * and bounded-round contract as [[kcorePeel]]; layers already peeled
    * never rejoin, so the union of per-round anti-joins partitions the
    * node set.
    */
  def peelLayers(edges: DataFrame, nodes: DataFrame, idCol: String,
                 k: Int, rounds: Int = 3): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val und = undirect(edges)
    def coreDeg(alive: DataFrame): DataFrame = {
      val live = und
        .join(alive.select(col("id").as("a")), "a")
        .join(alive.select(col("id").as("b")), "b")
      live.select(col("a").as("id"))
        .unionByName(live.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
    }
    var alive = nodes.select(col(idCol).as("id"))
    var layers = Seq.empty[DataFrame]
    for (r <- 1 to rounds) {
      val next = coreDeg(alive).filter(col("deg") >= k)
        .select("id").localCheckpoint()
      layers :+= alive.join(next, Seq("id"), "left_anti")
        .withColumn("layer", lit(r))
      alive = next
    }
    (layers :+ alive.withColumn("layer", lit(0)))
      .reduce(_ unionByName _)
  }

  /** Newman modularity of a labeled partition over `(id, nbr, w)`
    * integer edges (directed, weighted form):
    * `Q = Σ_c e_c/m − Σ_c d_c^out·d_c^in / m²` — the standard "is this
    * community structure better than chance" score that turns
    * [[labelPropagation]]'s output from a grouping into a MEASURED
    * grouping (compare parameter choices, alarm when a corpus's
    * neighborhood structure degrades). One row
    * `(communities, m, intra_w, q_micro)`, INTEGER-EXACT: the
    * community cross products `d^out·d^in` sum as decimal(38,0)
    * (`m ≤ N·k·w_max` passes int64 at ~10^9 nodes, `m²` does not), the
    * final division runs in driver BigInt off 1-row aggregates
    * (the corpusDrift convention), negative Q rounds half-away-from-
    * zero (the cohenKappa rule, so engine floor-vs-truncate divergence
    * never arises).
    *
    * Plan shape: two label joins onto the edge list (N·k rows), one
    * global 1-row agg, two label-sized groupBys joined on the label —
    * nothing quadratic. `labels` is `(id, lbl)`.
    */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val lab = labels.select(col("id"), col("lbl"))
    val j = edges
      .join(lab.select(col("id"), col("lbl").as("lc")), "id")
      .join(lab.select(col("id").as("nbr"), col("lbl").as("ln")), "nbr")
      .localCheckpoint()
    val head = j.agg(sum("w").as("m"),
        sum(when(col("lc") === col("ln"), col("w")).otherwise(0L))
          .as("intra"))
      .collect().head
    // an empty (or fully label-filtered) edge set aggregates to NULL
    // sums — diagnose it here, not as an NPE inside getLong
    require(!head.isNullAt(0) && head.getLong(0) > 0,
      "modularity needs a non-empty positive-weight graph whose " +
        "endpoints all carry labels")
    val (m, intra) = (head.getLong(0), head.getLong(1))
    val cross = BigInt(j.groupBy(col("lc").as("c")).agg(sum("w").as("dout"))
      .join(j.groupBy(col("ln").as("c")).agg(sum("w").as("din")), "c")
      .agg(coalesce(sum(col("dout").cast(dec) * col("din").cast(dec)),
        lit(0).cast(dec)).as("x"))
      .collect().head.getDecimal(0).toBigInteger)
    val nCommunities = lab.select("lbl").distinct().count()
    val num = BigInt(m) * intra - cross
    val den = BigInt(m) * m
    val mag = ((num.abs * 2000000 + den) / (den * 2)).toLong
    val q = if (num < 0) -mag else mag
    val spark = edges.sparkSession
    import spark.implicits._
    Seq((nCommunities, m, intra, q))
      .toDF("communities", "m", "intra_w", "q_micro")
  }

  /** Shared-nearest-neighbor strength for every directed edge of a
    * `(id, nbr, w)` k-NN graph: `shared(a→b) = |N(a) ∩ N(b)|`, the
    * out-neighborhood overlap (Jarvis–Patrick '73 / SNN clustering's
    * edge weight) — a similarity signal more robust than the raw dot in
    * high dimensions, where distance concentration makes raw ranks
    * noisy but AGREEMENT of neighbor sets stays discriminative: an edge
    * into a true topic clump shares most of its endpoint's neighbors,
    * an edge to a hub-by-accident shares none.
    *
    * Plan: one self-join of the edge list on the shared neighbor
    * (volume Σ_x indeg(x)² — bounded by the in-degree profile, which
    * the k-NN construction keeps near k on non-degenerate corpora; an
    * adversarial hub inflates it, the standard SNN caveat — cap
    * in-degree upstream if the corpus has one), one groupBy(a, b), one
    * join back to the edges. All integer, fully oracle-able.
    */
  def sharedNeighbors(edges: DataFrame): DataFrame = {
    val n1 = edges.select(col("id").as("a"), col("nbr").as("x"))
    val n2 = edges.select(col("id").as("b"), col("nbr").as("x"))
    val common = n1.join(n2, "x")
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
    edges.select(col("id").as("a"), col("nbr").as("b"), col("w"))
      .join(common, Seq("a", "b"), "left")
      .na.fill(0L, Seq("shared"))
  }

  /** EXACT incremental insert into a materialized `(id, nbr, dot)`
    * top-k edge state (the `knn-intdot` IndexCatalog artifact) — the CDC
    * update path for the graph-analytics family, extending the
    * BM25/MinHash index maintenance contract to the KNN graph: merging
    * a vector batch is O(|resident|·|delta|) dots, NOT the O(N²)
    * rebuild, and the result is BIT-EQUAL to a rebuild over
    * `resident ∪ delta` (spec-asserted, and driver-hashed via
    * `ns_ann_knn_update`), because top-k is mergeable under insertion:
    * for a resident node i, top-k over (C∪D)\\{i} = top-k of
    * (its current top-k over C\\{i}) ∪ (its dots to every delta vector)
    * — candidates outside the current top-k were already beaten by all
    * k residents and a new vector can only displace, never resurrect.
    *
    * Plan: delta rows take one broadcast-delta scan over the union
    * corpus ([[Similarity.intDotTopKBatch]]); resident updates are one
    * broadcast-delta map-side dot pass + a per-id re-rank window over
    * ≤ (k + |delta|) rows/id. Contract: `delta` ids are disjoint from
    * `resident` ids (an id upsert is delete-then-insert, like the text
    * indexes), and `k` MUST equal the k the edge state was built with —
    * with a larger k, untouched nodes keep only their old-k rows and the
    * rank-k prefilter threshold is too permissive to repair them, so the
    * result silently diverges from a rebuild (same failure shape as
    * probing a BM25 index with the wrong analyzer: the state encodes its
    * build parameter).
    */
  def insertExact(edges: DataFrame, resident: DataFrame, delta: DataFrame,
                  idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val all = resident.select(col(idCol), col(vecCol))
      .unionByName(delta.select(col(idCol), col(vecCol)))
    val deltaRows = Similarity.intDotTopKBatch(all, idCol, vecCol,
        delta, idCol, vecCol, k)
      .select(col("qid").as("id"), col("id").as("nbr"), col("dot"))
    val rq = resident.select(col(idCol).as("id"), col(vecCol).as("qv"))
    val dq = delta.select(col(idCol).as("nbr"), col(vecCol).as("dv"))
    val cand = rq.crossJoin(broadcast(dq))
      .withColumn("dot", graft.functions.int_dot_q(col("qv"), col("dv")))
      .select("id", "nbr", "dot")
    // LOSSLESS candidate prefilter before the re-rank shuffle: a
    // candidate strictly below its node's current rank-k dot cannot
    // enter the top-k (all k incumbents beat it on the primary key of
    // the total order), so only candidates >= that threshold — plus
    // every candidate of a node with < k incumbents — ride the window.
    // The map-side dot scan still scores N·|delta| pairs (unavoidable:
    // every pair must be LOOKED AT), but the shuffle shrinks from
    // N·|delta| rows to ~N·k + displacing candidates. Ties (==) are
    // kept: an equal-dot candidate can still displace on the nbr
    // tiebreak, and over-keeping is merely unpruned, never wrong.
    val thr = edges.groupBy("id")
      .agg(count(lit(1)).as("__n"), min("dot").as("__min"))
    val candKept = cand.join(thr, Seq("id"), "left")
      .filter(col("__n").isNull || col("__n") < k ||
        col("dot") >= col("__min"))
      .select("id", "nbr", "dot")
    val w = Window.partitionBy("id").orderBy(col("dot").desc, col("nbr"))
    edges.unionByName(candKept)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
      .unionByName(deltaRows)
  }

  /** EXACT incremental delete from the same edge state: removed nodes'
    * own rows drop; a survivor that LOST an edge (its rank ≤ k included
    * a removed id) cannot know its new rank-k from bounded state — the
    * one unavoidable exact repair — so exactly those AFFECTED ids are
    * re-scanned against the post-delete corpus
    * ([[Similarity.intDotTopKBatch]], broadcast affected queries).
    * Every other survivor keeps its rows verbatim: deleting vectors it
    * never ranked can only remove candidates it had already beaten.
    * Result is BIT-EQUAL to a rebuild over `resident \\ removeIds`
    * (spec-asserted). Repair cost is |affected|·N dots with
    * |affected| ≤ k·|removed| — delta-proportional for the CDC
    * steady state, never corpus-quadratic.
    *
    * `resident` is the PRE-delete corpus (the vectors the state was
    * built over); `removeIds` is one id column named `idCol`; `k` MUST
    * equal the k the edge state was built with (see [[insertExact]] —
    * a larger k leaves untouched survivors with only their old-k rows,
    * a silently truncated graph). IndexCatalog artifacts carry k in
    * their build params; pass that value through.
    */
  def deleteExact(edges: DataFrame, resident: DataFrame,
                  removeIds: DataFrame, idCol: String, vecCol: String,
                  k: Int): DataFrame = {
    val rm = removeIds.select(col(idCol).as("__rid"))
    // kept feeds the affected scan AND the untouched anti-join, and the
    // caller's `edges` lineage may itself be an expensive merge — without
    // truncation the upstream plan re-executes per consumer (measured
    // 44 s -> 5 s on the rebuild-equivalence query at sf0.1)
    val kept = edges
      .join(rm, edges("id") === col("__rid"), "left_anti")
      .localCheckpoint()
    val affected = kept
      .join(rm, kept("nbr") === col("__rid"), "left_semi")
      .select("id").distinct()
      .localCheckpoint()
    val survivors = resident
      .join(rm, resident(idCol) === col("__rid"), "left_anti")
    val repairQ = survivors
      .join(affected.withColumnRenamed("id", idCol), Seq(idCol),
        "left_semi")
    val repaired = Similarity.intDotTopKBatch(survivors, idCol, vecCol,
        repairQ, idCol, vecCol, k)
      .select(col("qid").as("id"), col("id").as("nbr"), col("dot"))
    kept.join(affected, Seq("id"), "left_anti")
      .unionByName(repaired)
  }
}
