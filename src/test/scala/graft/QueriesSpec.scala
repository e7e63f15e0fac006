package graft

import graft.queries.{AnalyticsQueries, CoreQueries, ExtQueries, MediaQueries}

/** Smoke + contract checks over the declared inventory at sf0.001. The deep
  * correctness gate is the driver's DuckDB differential (Verify.scala +
  * tools/crosscheck.py); this suite guards the contract invariants that
  * would silently zero that gate.
  */
class QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val defs = CoreQueries.defs ++ ExtQueries.defs ++
    AnalyticsQueries.defs ++ MediaQueries.defs

  test("no duplicate query names") {
    val names = defs.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every query runs and returns rows at sf0.001") {
    defs.foreach { d =>
      val n = d.build(spark, sf).count()
      assert(n > 0, s"${d.name} returned no rows")
    }
  }

  test("oracle column names match the Spark result columns") {
    // the driver compare sorts columns by name — a name mismatch is fatal
    defs.filter(_.oracle.isDefined).foreach { d =>
      val sparkCols = d.build(spark, sf).columns.map(_.toLowerCase).sorted.toSeq
      // extract oracle output names from "AS <name>" aliases + bare columns:
      // cheap structural check: every spark column name must appear in the SQL
      val sql = d.oracle.get.toLowerCase
      sparkCols.foreach { c =>
        assert(sql.contains(c), s"${d.name}: column '$c' absent from oracle SQL")
      }
    }
  }

  test("entry (flagship) is non-empty and covers all nations") {
    val df = SparkEntry.entry(spark)
    assert(df.count() == 25)
    assert(df.columns.contains("revenue"))
  }

  test("oracleSql maps only declared queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size == defs.size)
  }
}
