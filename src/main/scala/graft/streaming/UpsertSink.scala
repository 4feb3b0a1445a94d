package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming upsert ("latest row per key") sink over plain parquet — the
  * reference's warehouse sink upgraded to streaming semantics: each
  * micro-batch merges into a compacted state table where the newest row
  * per key wins.
  *
  * Shape per micro-batch: union(current state, batch) → one key-partitioned
  * window keeping (max ts, then max tie-break) → atomic swap of the state
  * directory (write to `<path>__stage`, then rename over `<path>`; readers
  * never observe a half-written table, and the new state is fully
  * materialized before the old one is touched — no read-overwrite race).
  *
  * Scale note: rewriting full state per batch is the plain-parquet
  * trade-off — correct and shuffle-minimal (one exchange on the key), but
  * O(state) I/O per batch. At 100 TB state you'd swap this class for a
  * transactional table format (Delta/Iceberg/Hudi MERGE) and keep the
  * identical dedup transform; state here is the compacted KEYS table
  * (dimensions, feature snapshots), not the raw stream.
  */
object UpsertSink {

  /** Newest row per key; equal-timestamp ties break on the caller's
    * `tieBreak` columns (descending) when given, else on a content hash
    * of the whole row — deterministic under any partitioning either way
    * (a physical row id would not be). */
  def latestPerKey(df: DataFrame, key: String, tsCol: String,
                   tieBreak: Seq[org.apache.spark.sql.Column] = Nil)
      : DataFrame = {
    val tie = if (tieBreak.nonEmpty) tieBreak.map(_.desc)
              else Seq(xxhash64(df.columns.map(col): _*).asc)
    val w = Window.partitionBy(col(key))
      .orderBy((col(tsCol).desc +: tie): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  private[streaming] def mergeBatch(batch: DataFrame, path: String,
                                    key: String, tsCol: String): Unit = {
    val spark = batch.sparkSession
    val target = new Path(path)
    val stage = new Path(path + "__stage")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current =
      if (fs.exists(target)) spark.read.parquet(path)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], batch.schema)
    latestPerKey(current.unionByName(batch), key, tsCol)
      .write.mode("overwrite").parquet(stage.toString)
    fs.delete(target, true)
    if (!fs.rename(stage, target))
      throw new java.io.IOException(s"atomic swap failed: $stage -> $target")
  }

  /** Start the streaming upsert into `path`, keyed by `key`, newest by
    * `tsCol`. */
  def start(stream: DataFrame, path: String, checkpoint: String,
            key: String, tsCol: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, path, key, tsCol)
      }
      .start()
}
