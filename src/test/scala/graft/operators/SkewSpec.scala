package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join, spreads hot keys over salts") {
    // 90% of fact rows carry one hot key — the classic skew shape
    val fact = (0 until 1000)
      .map(i => (if (i % 10 == 0) s"k$i" else "HOT", s"v$i"))
      .toDF("key", "payload")
    val dim = (Seq("HOT") ++ (0 until 1000 by 10).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"d$i") }.toDF("key", "attr")

    val plain = fact.join(dim, Seq("key"))
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 8)
    assert(salted.columns.toSeq === plain.columns.toSeq)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // the hot key's fact rows really are spread across several salt values
    val spread = fact.withColumn("__salt",
        Skew.saltOf(fact.columns.toIndexedSeq.map(col), 8))
      .filter(col("key") === "HOT")
      .select("__salt").distinct().count()
    assert(spread >= 6, s"hot key landed on only $spread of 8 salts")

    // left join keeps unmatched fact rows exactly once
    val factExtra = fact.union(Seq(("NOMATCH", "x")).toDF("key", "payload"))
    val left = Skew.saltedJoin(factExtra, dim, "key", 8, "left")
    assert(left.count() === plain.count() + 1)
    assert(left.filter(col("key") === "NOMATCH")
      .select("attr").head().isNullAt(0))
  }
}
