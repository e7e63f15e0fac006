package org.apache.spark.sql

/** Test-only bridge into `private[sql]` session state: lets specs assert on
  * the cache registry (e.g. "the corpus-cleaning cache is RELEASED after the
  * caller's action completes") through the same in-package-shim pattern as
  * the main-source [[GraftSqlBridge]].
  */
object GraftTestBridge {

  /** True iff the session's CacheManager holds no cached plans at all. */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
