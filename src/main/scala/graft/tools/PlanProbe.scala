package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev harness: execute a declared query and print its FINAL (post-AQE)
  * physical plan — what ExplainPrep (pre-execution) cannot show: reused
  * exchanges materialize only after AQE replans executed stages.
  * Usage: runMain graft.tools.PlanProbe <query> [sfDir]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.load(spark, sfDir, "documents").limit(1).count()
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case o => o.toString
    }
    println("===FINAL PLAN===")
    println(p)
  }
}
