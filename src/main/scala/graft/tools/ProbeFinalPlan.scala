package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Dev-only: execute a declared query (or a named probe) and print the
  * FINAL adaptive plan — the only place AQE stage reuse is visible (the
  * initial `explain` always renders both subtrees).
  *
  * Usage: runMain graft.tools.ProbeFinalPlan <queryName|shinglePairs> [sfDir]
  */
object ProbeFinalPlan {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("shinglePairs")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = name match {
      case "shinglePairs" =>
        graft.operators.Dedup.shinglePairs(
          Tables.load(spark, sfDir, "documents"), "doc_id", "text")
      case q => graft.SparkEntry.queries(q)(spark, sfDir)
    }
    // the noop write runs its own QueryExecution; capture ITS final plan
    // (post-AQE, where stage reuse is visible) via a listener
    @volatile var finalPlan = ""
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        finalPlan = qe.executedPlan.toString
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    df.write.format("noop").mode("overwrite").save()
    Thread.sleep(1500) // listener delivery is async
    val plan = if (finalPlan.nonEmpty) finalPlan
      else df.queryExecution.executedPlan.toString
    def count(p: String => Boolean) = plan.linesIterator.count(p)
    println(s"[final] $name: fileScans=${count(_.contains("Scan parquet"))} " +
      s"shuffleStages=${count(_.contains("ShuffleQueryStage"))} " +
      s"reusedStages=${count(_.contains("ReusedQueryStage") )} " +
      s"reusedExchange=${count(_.contains("ReusedExchange"))}")
    println(plan)
    spark.stop()
  }
}
