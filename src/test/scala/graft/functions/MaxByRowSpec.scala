package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaxByRowSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, 10L, "a", "x"),
    (1L, 30L, "b", null.asInstanceOf[String]), // winner for key 1 (null field)
    (1L, 20L, "c", "z"),
    (2L, 5L, "d", "only")
  ).toDF("k", "ord", "s1", "s2")

  private def winners() = df.groupBy("k")
    .agg(max_by_row(struct(col("ord"), col("s1"), col("s2")), col("ord")).as("w"))
    .select(col("k"), col("w.ord"), col("w.s1"), col("w.s2"))
    .as[(Long, Long, String, String)].collect().toSet

  test("keeps the max-ord row per group, null payload fields intact") {
    assert(winners() === Set((1L, 30L, "b", null), (2L, 5L, "d", "only")))
  }

  test("plan is an ObjectHashAggregate with partial aggregation, no sort-agg") {
    val plan = df.groupBy("k")
      .agg(max_by_row(struct(col("ord"), col("s1")), col("ord")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_max_by_row"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }

  test("duplicate-ord tie-break is deterministic (smaller byte image wins)") {
    val dup = Seq((1L, 7L, "bbb"), (1L, 7L, "aaa"), (1L, 7L, "bbb"))
      .toDF("k", "ord", "s")
    // repeated runs over shuffled input must agree
    val got = (1 to 3).map { seed =>
      dup.orderBy(rand(seed)).groupBy("k")
        .agg(max_by_row(struct(col("ord"), col("s")), col("ord")).as("w"))
        .select(col("w.s")).as[String].head()
    }
    assert(got.distinct.size === 1, s"nondeterministic tie-break: $got")
  }

  test("null ords are ignored; all-null group yields a null row") {
    val withNulls = Seq((1L, Some(4L), "keep"), (1L, None, "skip"),
      (2L, None, "gone")).toDF("k", "ord", "s")
    val got = withNulls.groupBy("k")
      .agg(max_by_row(struct(col("s")), col("ord")).as("w"))
      .select(col("k"), col("w.s")).as[(Long, Option[String])]
      .collect().toSet
    assert(got === Set((1L, Some("keep")), (2L, None)))
  }

  test("serialize/deserialize round-trips the buffer (shuffle path)") {
    val agg = MaxByRow(
      org.apache.spark.sql.GraftShim.expression(struct(lit(1L).as("a"))),
      org.apache.spark.sql.GraftShim.expression(lit(1L)))
    val buf = agg.createAggregationBuffer()
    assert(agg.deserialize(agg.serialize(buf)).has === false)
    buf.has = true; buf.ord = -42L; buf.bytes = Array[Byte](1, 2, 3)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.has && back.ord === -42L && back.bytes.toSeq === Seq[Byte](1, 2, 3))
  }
}
