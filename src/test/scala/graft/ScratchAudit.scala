package graft
class ScratchAudit extends SparkSpec {
  test("sweep all query plans at sf0.001") {
    val out = new java.io.PrintWriter("/tmp/audit/plans.tsv")
    for (q <- SparkEntry.orderedQueryNames) {
      try {
        val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        df.collect()
        val p = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan.toString
          case o => o.toString
        }
        def c(s: String) = p.linesIterator.count(_.contains(s))
        out.println(s"$q\t${c("FileScan")}\t${c("Generate")}\t${c("ReusedExchange")}\t${c("Exchange ")}\t${c("CartesianProduct")}\t${c("Window")}")
      } catch { case e: Throwable => out.println(s"$q\tERR\t${e.getClass.getSimpleName}") }
    }
    out.close()
  }
}
