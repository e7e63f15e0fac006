package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** docs/OPERATIONS.md rot gate (the SqlDocSpec idea applied to the runbook):
  * every backticked `Module.method` reference must resolve to a real method
  * on the named object — caught four stale names on the doc's first draft,
  * which is exactly the failure mode of prose runbooks.
  */
class OpsDocSpec extends AnyFunSuite {

  private val objects: Map[String, Class[_]] = Map(
    "Extract" -> graft.etl.Extract.getClass,
    "Load" -> graft.etl.Load.getClass,
    "Export" -> graft.etl.Export.getClass,
    "Validate" -> graft.etl.Validate.getClass,
    "Maintenance" -> graft.etl.Maintenance.getClass,
    "Observe" -> graft.etl.Observe.getClass,
    "Dedup" -> graft.operators.Dedup.getClass,
    "Ivf" -> graft.operators.Ivf.getClass,
    "Streaming" -> graft.streaming.Streaming.getClass)

  test("every Module.method reference in OPERATIONS.md resolves") {
    val md = Files.readString(Paths.get("docs/OPERATIONS.md"))
    // `Module.method` — possibly a call chain's first segment; a trailing
    // `*` marks a documented name-family prefix (loadToParquet*)
    val ref = """`([A-Z]\w+)\.(\w+)(\*)?""".r
    val refs = ref.findAllMatchIn(md)
      .map(m => (m.group(1), m.group(2), m.group(3) != null)).toList
      .filter { case (mod, _, _) => objects.contains(mod) }
    assert(refs.nonEmpty, "no resolvable references found — regex rot?")
    val methodsOf = objects.map { case (n, c) =>
      n -> c.getMethods.map(_.getName).toSet
    }
    val bad = refs.collect {
      case (mod, m, isPrefix)
          if !(if (isPrefix) methodsOf(mod).exists(_.startsWith(m))
               else methodsOf(mod).contains(m)) =>
        s"$mod.$m${if (isPrefix) "*" else ""}"
    }
    assert(bad.isEmpty,
      s"OPERATIONS.md references methods that do not exist: ${bad.mkString(", ")}")
  }
}
