package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.joins.{CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** Physical-plan skeleton dump for declared queries — the iteration loop
  * for "is this the plan you'd want at 100 TB": exchanges, join strategies,
  * aggregate modes, scans. `runMain graft.PlanAudit [query ...]` (default:
  * all declared queries) against sf0.01.
  */
object PlanAudit {

  /** Tables small enough that a shuffle join against them is always a plan
    * regression — they must broadcast at any SF this engine targets.
    */
  private val TinyDims = Set("region.parquet", "nation.parquet")

  /** Static-plan invariant check, used by [[Bench]] to fail-loud on plan
    * regressions instead of just running slower: returns one violation
    * string per offense, empty when the plan is clean. Checked invariants:
    *
    *  - `cartesian-product`: a `CartesianProductExec` anywhere. Nothing in
    *    the declared suite needs an unconditional cartesian — intentional
    *    all-pairs shapes go through broadcast nested-loop joins with a
    *    bounded side.
    *  - `shuffle-join-on-tiny-dim`: a sort-merge or shuffled-hash join
    *    whose subtree scans `region`/`nation` — dims that must broadcast.
    *
    * Call with AQE disabled so the STATIC planner's choices are audited
    * (AQE can rescue a bad static plan at runtime on one data shape and
    * not another; the static plan is the contract).
    */
  def violations(plan: SparkPlan): Seq[String] = {
    def scannedFiles(p: SparkPlan): Set[String] = p.collect {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.getName).toSet
    }.flatten.toSet
    val out = scala.collection.mutable.ListBuffer.empty[String]
    plan.foreach {
      case _: CartesianProductExec => out += "cartesian-product"
      case j: SortMergeJoinExec
          if (scannedFiles(j.left) ++ scannedFiles(j.right)).exists(TinyDims) =>
        out += "shuffle-join-on-tiny-dim"
      case j: ShuffledHashJoinExec
          if (scannedFiles(j.left) ++ scannedFiles(j.right)).exists(TinyDims) =>
        out += "shuffle-join-on-tiny-dim"
      case _ => ()
    }
    out.toSeq.distinct
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000") // TypedImperativeAggregate (top_n_by) groups per task
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
