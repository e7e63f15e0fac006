package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only batch plan capture: write `<outDir>/<query>_<suffix>.txt` for
  * each named query — the ExplainPrep counts line plus the full
  * `explain("formatted")` output — in ONE JVM/session, for the committed
  * before/after plan evidence an optimization round ships. Accepts declared
  * names and `_operator` twin names (the TimeQueries convention).
  *
  * Usage: runMain graft.tools.ExplainBatch <sfDir> <outDir> <suffix> <q1> [q2 ...]
  */
object ExplainBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val ops = graft.queries.ExtQueries.operatorOnly
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.get(name)
        .orElse(ops.get(name))
        .orElse(ops.get(name.stripSuffix("_operator")))
        .getOrElse(sys.error(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      def count(p: String => Boolean) = plan.linesIterator.count(p)
      val head = s"[plan] $name: fileScans=${count(_.contains("FileScan"))} " +
        s"exchanges=${count(_.contains("Exchange "))} " +
        s"reused=${count(_.contains("ReusedExchange"))} " +
        s"inMemScans=${count(_.contains("InMemoryTableScan"))} " +
        s"wscgSpans=${count(_.contains("WholeStageCodegen"))}"
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        (head + "\n\n" + formatted).getBytes("UTF-8"))
      println(head)
    }
    spark.stop()
  }
}
