package graft

import org.scalatest.funsuite.AnyFunSuite

/** README's "Query catalog" section is the user-facing query surface of
  * record — this gate pins it to the code so the two cannot drift: the set
  * of backticked query ids between the catalog markers must equal
  * `SparkEntry.orderedQueryNames` exactly (a query added without a catalog
  * row, or a catalog row whose query was renamed/removed, fails by name).
  */
class CatalogSpec extends AnyFunSuite {

  test("README query catalog lists exactly the declared inventory") {
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      "UTF-8")
    val begin = readme.indexOf("<!-- catalog:begin -->")
    val end = readme.indexOf("<!-- catalog:end -->")
    assert(begin >= 0 && end > begin, "catalog markers missing from README.md")
    val section = readme.substring(begin, end)
    val listed = "`(q_[a-z0-9_]+)`".r.findAllMatchIn(section)
      .map(_.group(1)).toList
    assert(listed.distinct.size === listed.size,
      s"duplicate catalog rows: ${listed.diff(listed.distinct).distinct}")
    val declared = SparkEntry.orderedQueryNames.toSet
    val missing = declared.diff(listed.toSet)
    val stale = listed.toSet.diff(declared)
    assert(missing.isEmpty, s"declared queries missing a catalog row: $missing")
    assert(stale.isEmpty, s"catalog rows for undeclared queries: $stale")
  }

  test("SURVEY.md current-totals line states the exact declared and twin " +
    "counts (VERDICT r11 #8: no hand-maintained count outside a pinned file)") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      "UTF-8")
    val decl = "declared queries: (\\d+)".r.findFirstMatchIn(survey)
    val twins = "operator bench twins: (\\d+)".r.findFirstMatchIn(survey)
    assert(decl.nonEmpty && twins.nonEmpty,
      "SURVEY.md lost its 'Current surface totals' line")
    assert(decl.get.group(1).toInt === SparkEntry.queries.size,
      "SURVEY declared-query total drifted from SparkEntry.queries")
    assert(twins.get.group(1).toInt ===
      graft.queries.ExtQueries.operatorOnly.size,
      "SURVEY operator-twin total drifted from ExtQueries.operatorOnly")
  }
}
