package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** S14 client parity (reference tests/test_idaice_client.py). Pure
  * driver-side — no SparkSession needed.
  */
class ClientSpec extends AnyFunSuite {

  test("listRuns parses run_{building}_{scenario}.zip with rsplit semantics") {
    val dir = SyntheticRuns.tempDir()
    SyntheticRuns.writeFixtureDir(dir)
    // an underscore-bearing building id: rsplit keeps it intact
    SyntheticRuns.writeRunZip(dir, SyntheticRuns.Spec("BLDG_01", "BASE", hours = 2))
    // a non-run file and an unparseable name are skipped, like the reference
    java.nio.file.Files.writeString(dir.resolve("notes.txt"), "ignore")
    java.nio.file.Files.writeString(dir.resolve("run_NOUNDERSCORE.zip"), "junk")

    val runs = new Client.LocalSimulationClient(dir.toString).listRuns()
    assert(runs.length == 5)
    assert(runs.map(r => (r.buildingId, r.scenarioId)).contains(("BLDG_01", "BASE")))
    assert(runs.map(r => (r.buildingId, r.scenarioId)).contains(("B2", "ECO")))
    assert(runs.forall(_.zipPath.endsWith(".zip")))
    // deterministic listing: sorted by filename
    assert(runs.map(_.zipPath) == runs.map(_.zipPath).sorted)
  }

  test("downloadRun locates an existing run and fails loudly on a missing one") {
    val dir = SyntheticRuns.tempDir()
    SyntheticRuns.writeRunZip(dir, SyntheticRuns.Spec("B1", "BASE", hours = 2))
    val client = new Client.LocalSimulationClient(dir.toString)
    assert(client.downloadRun("B1", "BASE").endsWith("run_B1_BASE.zip"))
    val err = intercept[java.io.FileNotFoundException] {
      client.downloadRun("B9", "NOPE")
    }
    assert(err.getMessage.contains("run_B9_NOPE.zip"))
  }

  test("a missing simulations directory fails at construction") {
    intercept[java.io.FileNotFoundException] {
      new Client.LocalSimulationClient("/definitely/not/here")
    }
  }

  test("getRunMetadata reads metadata.json without extracting the bundle") {
    val dir = SyntheticRuns.tempDir()
    SyntheticRuns.writeRunZip(dir, SyntheticRuns.Spec("B1", "ECO", hours = 2))
    val md = new Client.LocalSimulationClient(dir.toString).getRunMetadata("B1", "ECO")
    assert(md.building_id == "B1")
    assert(md.scenario_id == "ECO")
    assert(md.floor_area_m2 == 1000L)
  }

  test("API client: URL construction, defaults, https") {
    val c = new Client.IdaIceApiClient()
    assert(c.host == "localhost" && c.port == 8080 && c.apiKey.isEmpty)
    assert(c.buildUrl("/simulations") == "http://localhost:8080/simulations")
    val tls = new Client.IdaIceApiClient(host = "localhost", port = 443, useHttps = true)
    assert(tls.buildUrl("/simulations") == "https://localhost:443/simulations")
  }

  test("API client: configureSimulation validates building_id") {
    val c = new Client.IdaIceApiClient()
    val ok = c.configureSimulation(Map("building_id" -> "BLDG_01", "scenario" -> "BASE"))
    assert(ok("status") == "configured")
    assert(c.configuredSimulation("building_id") == "BLDG_01")
    intercept[IllegalArgumentException] {
      c.configureSimulation(Map("scenario" -> "BASE"))
    }
    intercept[IllegalArgumentException] {
      c.configureSimulation(Map("building_id" -> ""))
    }
  }

  test("API client: endpoint shapes via injectable transport") {
    var seen = Seq.empty[(String, String)]
    var params = Seq.empty[Map[String, String]]
    val c = new Client.IdaIceApiClient(transport = (m, e, p) => {
      seen :+= ((m, e)); params :+= p
      Map("job_id" -> "job_123", "status" -> "submitted")
    })
    assert(c.runSimulation("B1", "BASE")("status") == "submitted")
    assert(c.getSimulationStatus("job_123")("job_id") == "job_123")
    assert(c.retrieveResults("job_123").nonEmpty)
    assert(seen == Seq(
      ("POST", "/simulations/run"),
      ("GET", "/simulations/job_123/status"),
      ("GET", "/simulations/job_123/results")))
    // the requested run's ids are observable through the transport
    // (reference passes them as _make_request kwargs)
    assert(params.head == Map("building_id" -> "B1", "scenario_id" -> "BASE"))
    // default transport mirrors the reference's canned response
    val mock = new Client.IdaIceApiClient()
    assert(mock.runSimulation("B1", "BASE") ==
      Map("status" -> "ok", "endpoint" -> "/simulations/run"))
  }
}
