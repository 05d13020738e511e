package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: pre-shuffle fact tables by join key at WRITE
  * time so repeated joins/aggregations on that key run with NO exchange —
  * the co-located-join primitive for 100 TB star schemas where the same
  * fact⋈fact join runs in every pipeline (bucketing pays one shuffle at
  * ingest instead of one per query).
  *
  * Bucketed tables live in the session catalog/warehouse (Spark bucketing
  * metadata is table-level, not plain-directory parquet).
  */
object Bucketing {

  /** Write a table bucketed (and sorted) by `key` into the catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on their bucket keys. With
    * matching bucket counts Catalyst plans a sort-merge join with ZERO
    * Exchange operators on either side.
    */
  def joinBucketed(spark: SparkSession, t1: String, k1: String,
                   t2: String, k2: String): DataFrame = {
    val a = spark.table(t1)
    val b = spark.table(t2)
    a.join(b, a(k1) === b(k2))
  }

  /** True when the executed plan contains no shuffle exchange — the
    * property bucketing buys. Exposed for tests/monitoring.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
