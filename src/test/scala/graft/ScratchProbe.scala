package graft
class ScratchProbe extends SparkSpec {
  for (q <- Seq("q_dedup_spans", "q_dedup_jaccard", "q_lm_score")) {
    test(s"probe $q") {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect()
      val p = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan.toString
        case o => o.toString
      }
      info(s"$q REUSED=" + p.contains("ReusedExchange") + " NGEN=" + p.linesIterator.count(_.contains("Generate explode")))
    }
  }
}
