package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor: print scan/exchange/reuse counts and the full
  * formatted plan for any declared query.
  *
  * Usage: runMain graft.tools.ExplainPrep <queryName> [sfDir]
  *
  * Reading the counts: a FileScan rendered INSIDE an InMemoryTableScan
  * subtree is the cached plan's definition, not an extra executed scan —
  * executed base-table scans = top-level FileScans + one per cache
  * materialization.
  */
object ExplainPrep {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_prep_e2e")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val builder = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
    // trailing key=value args become session confs (dev knob, e.g.
    // spark.graft.cc.maxLocalEdges=0 to print the distributed-loop plan)
    args.drop(2).foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => builder.config(k, v)
        case _ => sys.error(s"expected key=value conf override, got: $kv")
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    def count(p: String => Boolean) = plan.linesIterator.count(p)
    println(s"[plan] $name: fileScans=${count(_.contains("FileScan"))} " +
      s"exchanges=${count(_.contains("Exchange "))} " +
      s"reused=${count(_.contains("ReusedExchange"))} " +
      s"inMemScans=${count(_.contains("InMemoryTableScan"))} " +
      s"wscgSpans=${count(_.contains("WholeStageCodegen"))}")
    df.explain("formatted")
    spark.stop()
  }
}
