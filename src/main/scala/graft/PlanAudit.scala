package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan skeleton dump for declared queries — the iteration loop
  * for "is this the plan you'd want at 100 TB": exchanges, join strategies,
  * aggregate modes, scans. `runMain graft.PlanAudit [query ...]` (default:
  * all declared queries) against sf0.01.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"===== $name =====")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.executedPlan.toString.linesIterator.foreach { l =>
          val skeleton = l.takeWhile(_ != '[').take(110)
          if (skeleton.trim.nonEmpty) println(skeleton)
        }
      } catch { case e: Exception => println(s"<error: ${e.getMessage}>") }
      println()
    }
    spark.stop()
  }
}
