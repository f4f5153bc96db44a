package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}

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
    *  - `sort-agg-over-cross-candidates`: a `SortAggregateExec` consuming
    *    an UNREDUCED broadcast nested-loop (cross-candidate) relation —
    *    the retired N·k assignment-argmax wall (RUNTIME.md §6: a
    *    `max_by(cid, struct(…))` or any array-valued buffer silently
    *    demotes the aggregate from HashAggregate to SortAggregate, which
    *    SORTS every candidate row; 160 s → 9.8 s at 1 M×2442 when
    *    retired). The wall re-imported itself once already via an
    *    innocent `first(v)` (r15), so the invariant is automated: flag
    *    any sort-aggregate whose subtree reaches a
    *    `BroadcastNestedLoopJoinExec` without an intervening aggregate
    *    (an intervening HashAggregate means the candidate relation was
    *    already reduced map-side and the sort agg runs on the skinny
    *    result — fine).
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
    // true iff the subtree reaches a broadcast nested-loop join with no
    // aggregate in between — i.e. the consumer above sees the RAW
    // cross-candidate relation (N·k rows), not a reduced form of it
    def unreducedCross(p: SparkPlan): Boolean = p match {
      case _: HashAggregateExec | _: ObjectHashAggregateExec |
           _: SortAggregateExec => false
      case _: BroadcastNestedLoopJoinExec => true
      case other => other.children.exists(unreducedCross)
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    plan.foreach {
      case _: CartesianProductExec => out += "cartesian-product"
      case a: SortAggregateExec if a.children.exists(unreducedCross) =>
        out += "sort-agg-over-cross-candidates"
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
      // the STATIC plan is the contract [[violations]] audits — with AQE
      // on, executedPlan is an opaque AdaptiveSparkPlanExec and every
      // invariant would vacuously pass
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    var bad = 0
    var unaudited = 0
    names.foreach { name =>
      println(s"===== $name =====")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.executedPlan
        val v = violations(plan)
        if (v.nonEmpty) { bad += 1; println(s"VIOLATIONS: ${v.mkString(", ")}") }
        plan.toString.linesIterator.foreach { l =>
          val skeleton = l.takeWhile(_ != '[').take(110)
          if (skeleton.trim.nonEmpty) println(skeleton)
        }
      } catch { case e: Exception =>
        // a query that cannot even PLAN was not audited — that must fail
        // the sweep, not read as clean (its static plan is exactly the
        // thing this tool exists to check)
        unaudited += 1
        println(s"<error: ${e.getMessage}>")
      }
      println()
    }
    println(s"PLAN AUDIT: ${names.size} queries, $bad with violations, " +
      s"$unaudited unaudited (planning error)")
    spark.stop()
    if (bad > 0 || unaudited > 0) sys.exit(1)
  }
}
