package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins. AQE's skew-join handles most
  * cases at runtime ([[org.apache.spark.sql.internal.SQLConf]]
  * `spark.sql.adaptive.skewJoin.enabled`, on by default in this engine's
  * sessions); this utility is the explicit fallback for joins AQE cannot
  * split — e.g. when the skewed side feeds a stateful/stream stage, or the
  * planner chose a broadcast that doesn't fit.
  *
  * Classic salting: the FACT side's key is suffixed with a random-but-
  * deterministic salt in [0, `salts`) (hash of the whole row, so replays
  * salt identically — no `rand()`, which breaks retry determinism); the DIM
  * side is exploded `salts`× with every suffix. The join key becomes
  * (key, salt), spreading one hot key over `salts` reducers. Dim-side blowup
  * is `salts`×|dim| — use for moderate dims or pre-filtered hot keys.
  */
object Skew {

  /** Deterministic per-row salt in [0, salts). */
  def saltOf(allCols: Seq[Column], salts: Int): Column =
    pmod(xxhash64(allCols: _*), lit(salts.toLong)).cast("int")

  /** Inner/left equi-join of `fact` with `dim` on `key`, salted `salts`
    * ways. Output columns = fact.* ++ dim.* minus dim's key (like a plain
    * `join(dim, Seq(key))` column layout).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFact = fact.withColumn("__salt",
      saltOf(fact.columns.toIndexedSeq.map(col), salts))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
