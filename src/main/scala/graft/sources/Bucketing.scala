package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table plumbing — the storage-level answer to repeated
  * shuffles. A table written with `bucketBy(n, key)` is physically
  * pre-partitioned by `hash(key) % n`; any join or aggregation keyed on
  * `key` between tables sharing the bucket spec reads co-located splits
  * and skips the Exchange entirely (SourcesSpec asserts the join plan has
  * ZERO shuffles). At 100 TB this converts the nightly fact⋈dim join from
  * "reshuffle 100 TB every run" to "shuffle once at write time, never
  * again" — the single biggest recurring-cost lever a warehouse layout
  * owns. `sortBy` within buckets additionally lets the sort-merge join
  * skip its per-task sort.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata rides the catalog). */
  def readBucketed(spark: org.apache.spark.sql.SparkSession,
                   table: String): DataFrame =
    spark.table(table)
}
