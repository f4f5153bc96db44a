package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-string (edit-distance) self-join — the entity-resolution /
  * data-cleaning primitive: all id pairs whose KEYS are within Levenshtein
  * distance `maxDist`. The naive form is an N² verify; the scalable form
  * here is q-gram PREFIX FILTERING (Chaudhuri et al. ICDE'06, ED-Join
  * VLDB'08), which is LOSSLESS:
  *
  *  - strings of equal length L within edit distance d share at least
  *    `t = (L-q+1) - q·d` of their positional q-gram multisets (each edit
  *    destroys at most q grams — Gravano et al. VLDB'01);
  *  - under ANY global total order over tagged grams `(gram, occurrence)`,
  *    two multisets with intersection ≥ t must intersect within their
  *    first `(L-q+1) - t + 1 = q·d + 1` elements — so joining on PREFIX
  *    grams only cannot miss a true pair;
  *  - ordering grams by ascending corpus frequency makes those prefixes
  *    the RAREST grams, so the equi-join's per-key fan-out is governed by
  *    rare-gram document frequencies, not by stopword grams ("the "
  *    never joins unless it is one of a key's q·d+1 rarest).
  *
  * Keys are normalized to EXACTLY `keyLen` chars (crop / `#`-pad) so the
  * count bound is uniform; `t <= 0` (tiny keys / large d) is rejected
  * loudly rather than silently degrading to all-pairs. Verification is
  * Spark's codegen'd `levenshtein`. Scale shape: one corpus-sized gram
  * count (map-side combined), one window per key over its ≤ L-q+1 grams,
  * an equi-join on `(gram, occ)` whose build side is prefix grams only
  * (q·d+1 per key), then the exact verify on the deduped candidates.
  *
  * CHOOSING q — the candidate volume is `Σ C(cnt,2)` over tagged prefix
  * grams, so q must make grams selective relative to N. Natural-language
  * keys (alphabet ~40, Zipf tails) are selective at the literature
  * default q=3; HIGH-UNIFORMITY keys over a tiny alphabet (ids, digit
  * strings) are not — at 1 M digit keys every 3-gram group holds ~10⁴
  * members and the join goes quadratic (measured: the ScaleSmoke `fuzzy`
  * stage hung at q=3 and runs in seconds at q=7). Raise q toward the
  * feasibility bound `q <= (L-d) div (d+1)` (keeps t >= 1): longer grams
  * shrink every group geometrically while the prefix fraction grows only
  * linearly.
  */
object FuzzyJoin {

  /** `(id_a, id_b, dist)`, `id_a < id_b`, `dist <= maxDist` — exact
    * edit-distance pairs over `keyCol`, prefix-filter pruned.
    */
  def selfJoin(df: DataFrame, idCol: String, keyCol: String,
               maxDist: Int, q: Int = 3, keyLen: Int = 24): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q > 0, s"q must be positive, got $q")
    val nGrams = keyLen - q + 1
    val t = nGrams - q * maxDist
    require(t > 0,
      s"count bound (L-q+1)-q*d = $t <= 0: keyLen $keyLen too short for " +
        s"maxDist $maxDist at q=$q — the filter would admit all pairs")
    val prefixLen = q * maxDist + 1

    val keyed = df.select(col(idCol).as("id"),
      rpad(col(keyCol), keyLen, "#").as("key"))
    val gramRows = taggedGrams(keyed, nGrams, q)
    val dfreq = gramRows.groupBy("gram").agg(count(lit(1)).as("gdf"))
    val prefix = prefixGrams(gramRows, dfreq, prefixLen)

    // candidates: prefix ∩ prefix on the tagged gram; verify exactly
    val cand = prefix.select(col("id").as("id_a"), col("key").as("ka"),
        col("gram"), col("occ"))
      .join(prefix.select(col("id").as("id_b"), col("key").as("kb"),
        col("gram"), col("occ")), Seq("gram", "occ"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ka", "kb").distinct()
    // banded threshold DP (returns -1 above maxDist): O(d·L) per verify
    // instead of the O(L²) full matrix — ~4x at d=2, L=24
    cand.withColumn("dist", levenshtein(col("ka"), col("kb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
  }

  /** Two-table variant — the reference-data cleanup shape: every
    * (left, right) id pair with `levenshtein <= maxDist` (dirty keys
    * matched against a canonical dictionary). Same lossless prefix
    * theorem, with ONE shared rarity order computed over BOTH sides'
    * grams — per-side orders would rank the same gram differently and
    * the two prefixes could legally miss each other.
    */
  def join(left: DataFrame, lidCol: String, lkeyCol: String,
           right: DataFrame, ridCol: String, rkeyCol: String,
           maxDist: Int, q: Int = 3, keyLen: Int = 24): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q > 0, s"q must be positive, got $q")
    val nGrams = keyLen - q + 1
    val t = nGrams - q * maxDist
    require(t > 0,
      s"count bound (L-q+1)-q*d = $t <= 0: keyLen $keyLen too short for " +
        s"maxDist $maxDist at q=$q — the filter would admit all pairs")
    val prefixLen = q * maxDist + 1

    val lKeyed = left.select(col(lidCol).as("id"),
      rpad(col(lkeyCol), keyLen, "#").as("key"))
    val rKeyed = right.select(col(ridCol).as("id"),
      rpad(col(rkeyCol), keyLen, "#").as("key"))
    val lGrams = taggedGrams(lKeyed, nGrams, q)
    val rGrams = taggedGrams(rKeyed, nGrams, q)
    val dfreq = lGrams.unionByName(rGrams)
      .groupBy("gram").agg(count(lit(1)).as("gdf"))
    val lPrefix = prefixGrams(lGrams, dfreq, prefixLen)
    val rPrefix = prefixGrams(rGrams, dfreq, prefixLen)

    val cand = lPrefix.select(col("id").as("id_l"), col("key").as("kl"),
        col("gram"), col("occ"))
      .join(rPrefix.select(col("id").as("id_r"), col("key").as("kr"),
        col("gram"), col("occ")), Seq("gram", "occ"))
      .select("id_l", "id_r", "kl", "kr").distinct()
    cand.withColumn("dist", levenshtein(col("kl"), col("kr"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_l"), col("id_r"), col("dist").cast("int").as("dist"))
  }

  /** Tagged positional grams `(id, key, gram, occ)` — the multiset
    * element the prefix theorem orders (substring with a column start
    * position needs the SQL form).
    */
  private def taggedGrams(keyed: DataFrame, nGrams: Int, q: Int): DataFrame =
    keyed.select(col("id"), col("key"),
        posexplode(expr(
          s"transform(sequence(1, $nGrams), i -> substring(key, i, $q))"))
          .as(Seq("gpos", "gram")))
      .withColumn("occ",
        row_number().over(Window.partitionBy("id", "gram").orderBy("gpos")))

  /** Each key's first `prefixLen` tagged grams under the shared
    * (gdf asc, gram, occ) rarity order.
    */
  private def prefixGrams(gramRows: DataFrame, dfreq: DataFrame,
                          prefixLen: Int): DataFrame = {
    val w = Window.partitionBy("id")
      .orderBy(col("gdf"), col("gram"), col("occ"))
    gramRows.join(dfreq, "gram")
      .withColumn("grank", row_number().over(w))
      .filter(col("grank") <= prefixLen)
      .select(col("id"), col("key"), col("gram"), col("occ"))
  }
}
