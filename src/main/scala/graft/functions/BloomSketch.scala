package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge => B}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column surface over Spark's native Bloom-filter sketch expressions
  * (the machinery behind runtime row-level filtering, exposed here as an
  * explicit operator building block).
  *
  * Why this exists: several training-pipeline gates are semi/anti joins of
  * a 100 TB corpus against a "small-ish but not broadcastable" key set —
  * e.g. the distinct n-gram set of a full eval-suite collection is easily
  * GBs (too big for `broadcast()`), while its Bloom summary at the same
  * membership power is MBs. A Bloom pre-filter keeps the corpus side
  * map-only and shrinks what reaches the exact-confirm shuffle join from
  * |corpus keys| to |true hits| + fpp·|corpus keys|; no false negatives
  * means pre-filter + exact confirm is bit-identical to the exact join.
  *
  * Both expressions are Spark-native and codegen'd (`XxHash64` feeding
  * `BloomFilterMightContain`), so the probe stays inside whole-stage
  * codegen on the scan — no UDF, no deserialization per row (the filter
  * bitmap deserializes once per task).
  */
object BloomSketch {

  /** Aggregate a key column into a serialized Bloom filter (one binary
    * row). `expectedItems` sizes the hash count; `numBits` the bitmap.
    * Build this on the SMALL side and collect — the blob is the only
    * driver traffic (m/8 bytes; 20 bits/key ≈ 6e-5 fpp).
    */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    B.column(BloomFilterAggregate(new XxHash64(Seq(B.expression(key))),
      Literal(expectedItems), Literal(numBits), 0, 0).toAggregateExpression())

  /** Membership probe of `key` against a collected Bloom blob. May return
    * false positives (rate set by the build sizing), never false negatives
    * — callers MUST exact-confirm downstream when exactness matters.
    */
  def bloomMightContain(blob: Array[Byte], key: Column): Column =
    B.column(BloomFilterMightContain(Literal(blob),
      new XxHash64(Seq(B.expression(key)))))

  /** Bitmap sizing for a target ~6e-5 false-positive rate (20 bits/key),
    * floored so tiny builds still hash well and capped at 64 Mbit (8 MB —
    * comfortably broadcastable; beyond that, revisit the fpp trade).
    */
  def sizeBits(expectedItems: Long): Long =
    math.min(20L * math.max(expectedItems, 64L), 1L << 26)
}
