package graft.sources

import org.apache.spark.sql.DataFrame

/** Small-file compaction — the write-side answer to the 100 TB
  * small-files problem. A streaming micro-batch or over-parallel job
  * leaving thousands of KB-scale parquet files makes every later scan pay
  * per-file open/footer costs and floods the driver's file listing;
  * compaction rewrites to a bounded file count sized from the actual row
  * count, not the incoming partitioning.
  *
  * One `count()` job prices the layout (cheap: count pushes down to
  * parquet footers), then a round-robin repartition spreads rows evenly
  * across exactly `ceil(n / targetRows)` writers — `maxRecordsPerFile`
  * backstops the cap if a writer still overflows. Repartition-by-nothing
  * (round-robin) rather than coalesce: coalesce(k) would fuse upstream
  * computation into k tasks, while the explicit shuffle keeps upstream
  * parallelism and only narrows at the write.
  */
object Compaction {

  /** Rewrite `df` under `path` in `ceil(rows / targetRows)` parquet
    * files. Returns the file count written. */
  def writeCompacted(df: DataFrame, path: String, targetRows: Long): Int = {
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    val n = df.count()
    val files = math.max(1, ((n + targetRows - 1) / targetRows).toInt)
    df.repartition(files)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRows)
      .parquet(path)
    files
  }
}
