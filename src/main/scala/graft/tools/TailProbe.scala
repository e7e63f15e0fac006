package graft.tools

/** Dev harness for the driver's tail capture contract: prints a single
  * JSON headline line exactly the way [[graft.Bench]] does, so
  * `sbt "runMain graft.tools.TailProbe"` empirically verifies that the
  * LAST stdout line of the sbt invocation is bare parseable JSON — no
  * `[info] ` logger prefix (build.sbt `run / outputStrategy :=
  * Some(StdoutOutput)`), no `[success]` trailer (`showSuccess := false`).
  * Costs ~nothing (no SparkSession), unlike replaying the full Bench.
  */
object TailProbe {
  def main(args: Array[String]): Unit = {
    println("x" * 100) // junk line the tail window must not trip on
    println("""{"metric":"tailprobe","value":1,"unit":"sec"}""")
  }
}
