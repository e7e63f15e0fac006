package graft

/** Regenerates the committed plan-fingerprint snapshot that PlanHashSpec
  * gates against: `sbt "Test/runMain graft.PlanHashSnapshot"`. Run it ONLY
  * alongside a deliberate plan change (and say so in the commit) — the
  * whole point of the tripwire is that an unexplained diff here fails CI.
  */
object PlanHashSnapshot {
  val sfDir = "/root/testdata/sf0.01"
  val snapshotPath = "src/test/resources/plan_hashes.tsv"

  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val lines = SparkEntry.orderedQueryNames.map { n =>
      s"$n\t${PlanHash.hash(SparkEntry.queries(n)(spark, sfDir))}"
    }
    val p = java.nio.file.Paths.get(snapshotPath)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    println(s"wrote ${lines.size} plan hashes to $snapshotPath")
    spark.stop()
  }
}
