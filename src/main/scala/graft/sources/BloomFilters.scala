package graft.sources

import org.apache.spark.sql.DataFrame

/** Parquet bloom-filter indexing — point-lookup data skipping for
  * columns min/max stats can't help with. Footer min/max prunes range
  * predicates on clustered columns ([[ZOrder]]); an equality probe on an
  * UNSORTED high-cardinality key (tx_hash, doc_id, address) matches every
  * row group's [min, max] and scans the world. A per-row-group bloom
  * filter answers "definitely not here" for ~1 byte/row, so the reader
  * skips every group but the few that might hold the key — the secondary
  * index a warehouse layout gets without maintaining one.
  *
  * At small per-group cardinality parquet's dictionary filtering already
  * gives this; blooms matter exactly at scale, where dictionaries
  * overflow and fall back to plain encoding. The writer therefore
  * disables dictionary encoding for the bloom'd columns (mirroring the
  * at-scale state); the spec shows a point lookup scanning all rows of a
  * plain layout and a small fraction of the bloom'd one.
  */
object BloomFilters {

  /** Write `df` under `path` with bloom filters on `cols`. `ndv` is the
    * expected distinct count PER ROW GROUP (sizes the filter). */
  def writeWithBloom(df: DataFrame, path: String, cols: Seq[String],
                     ndv: Long): Unit = {
    val w = cols.foldLeft(
      df.write.mode("overwrite")
        .option("parquet.enable.dictionary", "false")) { (wr, c) =>
      wr.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    w.parquet(path)
  }
}
