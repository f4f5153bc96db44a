package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorAvgSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", Some(Array(1.0f, 2.0f, 3.0f))),
    ("a", Some(Array(3.0f, 4.0f, 5.0f))),
    ("a", None),
    ("b", Some(Array(10.0f, 20.0f, 30.0f))),
    ("c", None)
  ).toDF("g", "vec")

  test("element-wise group means; nulls ignored; all-null group is null") {
    val out = df.groupBy("g").agg(vector_avg(col("vec")).as("m"))
      .collect().map(r => r.getString(0) ->
        Option(r.getSeq[Float](1)).map(_.toSeq)).toMap
    assert(out("a").get === Seq(2.0f, 3.0f, 4.0f))
    assert(out("b").get === Seq(10.0f, 20.0f, 30.0f))
    assert(out("c").isEmpty)
  }

  test("partials combine map-side (partial_vector_avg in the plan)") {
    val plan = df.repartition(4).groupBy("g")
      .agg(vector_avg(col("vec")).as("m"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_vector_avg"),
      s"expected a partial aggregate stage:\n$plan")
  }

  test("registered for SQL") {
    df.createOrReplaceTempView("va_in")
    graft.functions.GraftFunctions.register(spark)
    val m = spark.sql(
      "SELECT vector_avg(vec) AS m FROM va_in WHERE g = 'b'")
      .collect().head.getSeq[Float](0)
    assert(m === Seq(10.0f, 20.0f, 30.0f))
  }

  test("mismatched vector lengths fail loudly") {
    val bad = Seq(("a", Array(1.0f)), ("a", Array(1.0f, 2.0f))).toDF("g", "vec")
    val ex = intercept[Exception] {
      bad.groupBy("g").agg(vector_avg(col("vec"))).collect()
    }
    assert(ex.getMessage != null)
  }
}
