package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-extra-pass pipeline telemetry via `Dataset.observe` — the idiomatic
  * Spark answer to "how many rows / how many nulls did this stage see?"
  * at 100 TB. The naive spelling (`df.count()`, `df.where(...).count()`
  * before the real action) costs one FULL extra job per metric; `observe`
  * evaluates the named aggregates inside the SAME physical plan as the
  * action that was going to run anyway — metrics ride the existing scan
  * as accumulator-style partial aggregates, adding zero shuffles and zero
  * extra reads, and arrive on the driver when the action completes.
  *
  * Contract notes (spec-pinned in ObserveSpec):
  *   - metrics materialize only AFTER an action runs over the instrumented
  *     DataFrame — `Observation.get` blocks until then, so the wrapper is
  *     for pipelines that were about to write/collect anyway;
  *   - only aggregates on the observed point of the plan are legal (no
  *     further references to the input's columns);
  *   - each Observation instance is single-use (Spark enforces one plan
  *     registration), so instrument per run, not per application.
  */
object Observe {

  /** Attach named aggregate metrics to `df`. Returns the instrumented
    * frame (use IT in the downstream action, not the original) and the
    * handle whose `.get` yields the metric map once an action has run.
    */
  def instrument(df: DataFrame, name: String,
      metrics: (String, Column)*): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "instrument needs at least one metric")
    val obs = Observation(name)
    val named = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, named.head, named.tail: _*), obs)
  }

  /** The standard corpus-stage health panel: row count, NULL/empty text
    * counts, and total characters — the numbers every funnel stage report
    * wants, priced at zero extra jobs.
    */
  def corpusMetrics(df: DataFrame, textCol: String,
      name: String): (DataFrame, Observation) =
    instrument(df, name,
      "rows" -> count(lit(1)),
      "null_text" -> count(when(col(textCol).isNull, lit(1))),
      "empty_text" -> count(when(length(col(textCol)) === 0, lit(1))),
      "total_chars" -> coalesce(sum(length(col(textCol))), lit(0L)))
}
