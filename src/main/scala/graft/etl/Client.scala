package graft.etl

import java.io.File

/** Simulation clients (SURVEY §2.1 S14; reference src/idaice_client.py).
  *
  * The reference's cloud client is itself a MOCK — its transport returns a
  * canned response (idaice_client.py:51-55) because the real API is
  * proprietary — so parity here means mirroring that surface honestly
  * (URL construction, config validation, endpoint shapes, injectable
  * transport), not inventing a network stack.
  */
object Client {

  /** One discoverable run (reference list_runs dict, idaice_client.py:161-165). */
  final case class RunRef(buildingId: String, scenarioId: String, zipPath: String)

  /** Local file-based client over a directory of `run_*.zip` bundles
    * (reference LocalSimulationClient, idaice_client.py:119-218).
    */
  final class LocalSimulationClient(simulationsDir: String) {
    private val dir = new File(simulationsDir)
    if (!dir.isDirectory)
      throw new java.io.FileNotFoundException(
        s"Simulations directory not found: $simulationsDir")

    /** Lists runs with ids parsed from the filename
      * (reference idaice_client.py:141-166): strip `run_`/`.zip`, then the
      * LAST underscore splits building from scenario (the reference's
      * `rsplit("_", 1)`) — building ids may contain underscores, the final
      * scenario token may not. Files with no underscore after the prefix
      * are skipped, exactly like the reference. Sorted by filename: the
      * reference inherits filesystem glob order; a deterministic listing is
      * strictly more reproducible.
      */
    def listRuns(): Seq[RunRef] =
      Option(dir.listFiles()).getOrElse(Array.empty).toSeq
        .filter(f => f.getName.startsWith("run_") && f.getName.endsWith(".zip"))
        .sortBy(_.getName)
        .flatMap { f =>
          val stem = f.getName.stripSuffix(".zip").stripPrefix("run_")
          val i = stem.lastIndexOf('_')
          if (i > 0 && i < stem.length - 1)
            Some(RunRef(stem.substring(0, i), stem.substring(i + 1), f.getPath))
          else None
        }

    /** "Download" = locate the local ZIP (reference idaice_client.py:168-190:
      * no copy, just a checked path).
      */
    def downloadRun(buildingId: String, scenarioId: String): String = {
      val f = new File(dir, s"run_${buildingId}_${scenarioId}.zip")
      if (!f.exists())
        throw new java.io.FileNotFoundException(
          s"Run not found: ${f.getName} in $simulationsDir")
      f.getPath
    }

    /** Reads ONLY `metadata.json` out of the bundle — no full extraction
      * (reference idaice_client.py:192-218). Same strict field parse as the
      * ETL path ([[Extract.parseMetadata]]), so a malformed metadata fails
      * identically in both.
      */
    def getRunMetadata(buildingId: String, scenarioId: String): RunMetadata = {
      val zipPath = downloadRun(buildingId, scenarioId)
      val runId = s"run_${buildingId}_${scenarioId}"
      val zf = new java.util.zip.ZipFile(zipPath)
      try {
        val entry = zf.getEntry(s"$runId/metadata.json")
        if (entry == null)
          throw new java.io.FileNotFoundException(s"metadata.json not found in $zipPath")
        Extract.parseMetadata(zf.getInputStream(entry).readAllBytes())
      } finally zf.close()
    }
  }

  /** REST-shaped cloud client (reference IDAICEClient, idaice_client.py:16-116).
    * `transport` is injectable for tests (the reference patches
    * `_make_request` the same way); the default mirrors the reference's
    * canned `{"status": "ok", "endpoint": ...}` response.
    */
  final class IdaIceApiClient(
      val host: String = "localhost",
      val port: Int = 8080,
      val apiKey: Option[String] = None,
      val useHttps: Boolean = false,
      transport: (String, String, Map[String, String]) => Map[String, String] =
        IdaIceApiClient.mockTransport) {

    private var config: Map[String, String] = Map.empty

    /** reference idaice_client.py:46-49 */
    def buildUrl(endpoint: String): String =
      s"${if (useHttps) "https" else "http"}://$host:$port$endpoint"

    /** reference idaice_client.py:57-74: building_id is mandatory. */
    def configureSimulation(c: Map[String, String]): Map[String, String] = {
      if (!c.get("building_id").exists(_.nonEmpty))
        throw new IllegalArgumentException("building_id is required in configuration")
      config = c
      Map("status" -> "configured") ++ c
    }

    def configuredSimulation: Map[String, String] = config

    /** reference idaice_client.py:76-92: the ids travel as request params
      * (`_make_request(..., building_id=..., scenario_id=...)`) — an
      * injected transport can observe WHICH run was requested.
      */
    def runSimulation(buildingId: String, scenarioId: String): Map[String, String] =
      transport("POST", "/simulations/run",
        Map("building_id" -> buildingId, "scenario_id" -> scenarioId))

    def getSimulationStatus(jobId: String): Map[String, String] =
      transport("GET", s"/simulations/$jobId/status", Map.empty)

    def retrieveResults(jobId: String): Map[String, String] =
      transport("GET", s"/simulations/$jobId/results", Map.empty)
  }

  object IdaIceApiClient {
    /** The reference's mock `_make_request` (idaice_client.py:51-55). */
    val mockTransport: (String, String, Map[String, String]) => Map[String, String] =
      (_, endpoint, _) => Map("status" -> "ok", "endpoint" -> endpoint)
  }
}
