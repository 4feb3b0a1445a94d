package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) compaction: collapse a per-key
  * ordered snapshot series into validity intervals, keeping one row per
  * change. This is the warehouse-side complement of
  * [[graft.streaming.UpsertSink]] — the upsert sink keeps only the newest
  * row per key, SCD2 keeps the full change history in interval form
  * (`valid_from` inclusive, `valid_to` exclusive, null = current).
  *
  * Shape: two windows over the same (keys, order) partitioning — one lag
  * pass marking change rows, one lead pass over the survivors closing each
  * interval — so a single exchange on the keys serves both and the op
  * shards by key at any scale. Null-safe comparison (`<=>`) means a
  * null→value or value→null transition counts as a change, and the
  * first row per key is always kept.
  */
object Scd {

  /** Compact `df` to change rows with `[valid_from, valid_to)` intervals.
    * `orderCol` is the snapshot time; `valueCols` are the tracked
    * attributes. Output keeps keys + valueCols and adds
    * valid_from/valid_to. */
  def compactHistory(df: DataFrame, keys: Seq[String], orderCol: String,
                     valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val changed = valueCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce[Column](_ || _)
    df.withColumn("__chg",
        changed || lag(col(orderCol), 1).over(w).isNull)
      .filter(col("__chg"))
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .drop("__chg", orderCol)
  }
}
