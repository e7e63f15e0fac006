package graft.etl

import java.nio.file.Files
import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  test("end-to-end pipeline: extract -> transform -> validate -> load -> export") {
    val simDir = SyntheticRuns.tempDir()
    SyntheticRuns.writeFixtureDir(simDir)
    val outDir = Files.createTempDirectory("graft_pipe_").toString
    val code = Pipeline.run(spark, Pipeline.Config(
      simulationsDir = simDir.toString, outputDir = outDir))
    assert(code == 0)
    assert(new java.io.File(outDir, "fact_meters.parquet").exists())
    assert(new java.io.File(outDir, "ida_ice_simulation_summary.json").exists())
    assert(Export.validateSummaryJson(
      s"$outDir/ida_ice_simulation_summary.json").isEmpty)
  }

  test("validation failure aborts with exit code 2 unless forced") {
    val simDir = SyntheticRuns.tempDir()
    SyntheticRuns.writeRunZip(simDir,
      SyntheticRuns.Spec("B1", "BASE", corrupt = Map("air_temp_C" -> 50.0)))
    val outDir = Files.createTempDirectory("graft_pipe_bad_").toString
    val code = Pipeline.run(spark, Pipeline.Config(
      simulationsDir = simDir.toString, outputDir = outDir))
    assert(code == 2)
    assert(!new java.io.File(outDir, "fact_meters.parquet").exists())

    val forced = Pipeline.run(spark, Pipeline.Config(
      simulationsDir = simDir.toString, outputDir = outDir, force = true))
    assert(forced == 0)
    assert(new java.io.File(outDir, "fact_meters.parquet").exists())
  }

  test("skip-validation loads corrupted data without checks") {
    val simDir = SyntheticRuns.tempDir()
    SyntheticRuns.writeRunZip(simDir,
      SyntheticRuns.Spec("B1", "BASE", corrupt = Map("power_kw" -> -5.0)))
    val outDir = Files.createTempDirectory("graft_pipe_skip_").toString
    val code = Pipeline.run(spark, Pipeline.Config(
      simulationsDir = simDir.toString, outputDir = outDir, skipValidation = true))
    assert(code == 0)
  }

  test("distributed pipeline path produces the same tables") {
    val simDir = SyntheticRuns.tempDir()
    SyntheticRuns.writeFixtureDir(simDir)
    val outDir = Files.createTempDirectory("graft_pipe_dist_").toString
    val code = Pipeline.run(spark, Pipeline.Config(
      simulationsDir = simDir.toString, outputDir = outDir, distributed = true))
    assert(code == 0)
    assert(spark.read.parquet(s"$outDir/fact_zone_conditions.parquet").count() == 4 * 48 * 3)
  }

  test("argument parsing") {
    val cfg = Pipeline.parseArgs(Array(
      "--simulations-dir", "/a", "--output-dir", "/b", "--skip-validation"))
    assert(cfg.simulationsDir == "/a" && cfg.outputDir == "/b" && cfg.skipValidation)
    intercept[IllegalArgumentException] { Pipeline.parseArgs(Array("--bogus")) }
    intercept[IllegalArgumentException] { Pipeline.parseArgs(Array("--output-dir", "/b")) }
  }
}
