package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ColocateSpec extends SparkSpec {

  private def withoutBroadcast[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("same-layout bucketed tables join with zero Exchange on either side") {
    Colocate.materialize(Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice"),
      "co_orders", "o_custkey", numBuckets = 8)
    Colocate.materialize(Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("o_custkey"), col("c_name")),
      "co_customer", "o_custkey", numBuckets = 8)

    withoutBroadcast {
      val joined = Colocate.join(spark, "co_orders", "co_customer")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed layout must satisfy both sides' distribution:\n$plan")

      // and the shuffle-free plan returns the same rows as a plain join
      val plain = Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .join(Tables.customer(spark, sfDir)
          .select(col("c_custkey").as("o_custkey"), col("c_name")), "o_custkey")
      assert(joined.count() === plain.count())
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    }
  }

  test("layout mismatches fail loud, never plan a silent shuffle") {
    Colocate.materialize(Tables.nation(spark, sfDir), "co_nation8",
      "n_nationkey", numBuckets = 8)
    Colocate.materialize(Tables.nation(spark, sfDir), "co_nation16",
      "n_nationkey", numBuckets = 16)
    val e = intercept[IllegalArgumentException] {
      Colocate.join(spark, "co_nation8", "co_nation16")
    }
    assert(e.getMessage.contains("bucket counts differ"))

    spark.range(1).toDF("id").write.mode("overwrite").saveAsTable("co_flat")
    val e2 = intercept[IllegalArgumentException] {
      Colocate.join(spark, "co_nation8", "co_flat")
    }
    assert(e2.getMessage.contains("not bucketed"))
  }

  test("same-named bucket keys of different types fail loud (cast would force an Exchange)") {
    import spark.implicits._
    Colocate.materialize((1L to 10L).toDF("k"), "co_klong", "k", numBuckets = 8)
    Colocate.materialize((1 to 10).map(_.toString).toDF("k"), "co_kstr", "k",
      numBuckets = 8)
    val e = intercept[IllegalArgumentException] {
      Colocate.join(spark, "co_klong", "co_kstr")
    }
    assert(e.getMessage.contains("bucket key types differ"))
  }
}
