package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField}

/** Distributed GLOBAL row numbering — the scalable spelling of
  * `row_number() OVER (ORDER BY ...)` with no partition key, which Spark
  * plans as a SINGLE-partition window: every row of a 100 TB table funnels
  * through one task (WindowExec even warns). The engine's declared queries
  * only ever run the bare global window on provably bounded domains
  * (distinct dates, top-k cuts); this operator is for the unbounded case —
  * assigning a stable global ordinal to a whole corpus (resume cursors,
  * deterministic pagination, rank features).
  *
  * Shape: `repartitionByRange` on the order columns (one range shuffle at
  * full parallelism — Spark samples the range bounds), sort within each
  * partition, then `zipWithIndex` assigns contiguous global indices in
  * (partition, row) order — exactly the global sort order, because range
  * partitions are themselves ordered. zipWithIndex costs one extra COUNT
  * job over the sorted partitions (to learn per-partition offsets) — a
  * metadata-sized pass, vs the one-task sort it replaces. The RDD hop is
  * deliberate imperative-per-partition territory (the documented last
  * resort): nothing in the Column algebra can append a cross-partition
  * running index without either the one-partition window or a second
  * full-data shuffle onto partition ids.
  *
  * Caller contract (spec-pinned): `orderCols` must be a TOTAL order (add a
  * unique tiebreak column) — with ties the intra-tie assignment would be
  * partition-placement dependent; order columns must be non-NULL (Spark
  * ranges sort NULLS FIRST, ANSI row_number defaults NULLS LAST — keeping
  * NULLs out keeps the operator oracle-exact).
  */
object Rank {

  def globalRowNumber(df: DataFrame, orderCols: Seq[String],
      rnCol: String = "rn"): DataFrame = {
    require(orderCols.nonEmpty, "globalRowNumber needs at least one order column")
    require(!df.columns.contains(rnCol), s"output column $rnCol already exists")
    val ranged = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = ranged.schema.add(StructField(rnCol, LongType, nullable = false))
    val indexed = ranged.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }
}
