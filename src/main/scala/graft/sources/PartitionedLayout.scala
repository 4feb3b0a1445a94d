package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style directory partitioning — the zeroth data-skipping lever at
  * 100 TB: a predicate on the partition column never touches the data
  * files at all, it prunes whole directories during planning (footer
  * stats, blooms, and Z-order all operate AFTER this cut, inside the
  * files that survive). Standard layout for the corpus tables here is
  * `lang`/`source` (or ingest date) — low-cardinality, stable, and in
  * every query's WHERE clause.
  *
  * Partition columns must stay low-cardinality: each value is a
  * directory, and a high-cardinality partition key (doc_id, tx_hash)
  * recreates the small-files problem [[Compaction]] exists to fix.
  * `maxFilesPerPartition` caps the writer fan-out per directory.
  */
object PartitionedLayout {

  /** Write `df` under `path` partitioned by `cols` (directory per
    * value-combination), at most `maxFilesPerPartition` files each. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String],
                       maxFilesPerPartition: Int = 1): Unit =
    df.repartition(maxFilesPerPartition,
        cols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite")
      .partitionBy(cols: _*)
      .parquet(path)

  /** Read a partitioned table back; partition columns are reconstructed
    * from the directory structure and prune during planning. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
