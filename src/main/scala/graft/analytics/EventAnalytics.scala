package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event analytics — the operators a platform serving the
  * reference's event tables grows next (sessions, funnels, cohorts), plus
  * the deterministic corpus splitter a training-data pipeline needs. All
  * are shuffle-minimal compositions of hash aggregates and user-partitioned
  * windows: per-user windows shard naturally (user_id is the partition
  * key — never a global window), and every output is count/min/max-exact,
  * so each has a hash-exact DuckDB oracle twin.
  */
object EventAnalytics {

  /** Sessionize events per user: a new session starts after `gapSeconds` of
    * inactivity. One user-partitioned window (lag + running sum) and one
    * hash aggregate — the canonical distributed sessionization; state per
    * task is one row.
    *
    * Expects columns (user_id, event_id, ts). Returns one row per session:
    * (user_id, session_id 1-based, session_start, session_end, n_events,
    * duration_sec).
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val us = expr("unix_micros(ts)")
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val brk = when(lag(col("us"), 1).over(w).isNull ||
      col("us") - lag(col("us"), 1).over(w) > gapSeconds * 1000000L, 1)
      .otherwise(0)
    events
      .select(col("user_id"), col("event_id"), col("ts"), us.as("us"))
      .withColumn("session_id", sum(brk).over(
        Window.partitionBy("user_id").orderBy("us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        expr("(max(us) - min(us)) div 1000000").as("duration_sec"))
      .orderBy("user_id", "session_id")
  }

  /** Strict-order funnel over event types: per user, the first `stages(0)`
    * event, then the first `stages(1)` strictly after it, and so on. Each
    * stage is a filter + per-user min aggregate + broadcast-size join on
    * user_id; no window, no self-join explosion. Returns one row:
    * (stage_1_users, stage_2_users, ..., stage_N_users).
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val us = expr("unix_micros(ts)")
    val base = events.select(col("user_id"), col("event_type"), us.as("us"))
    var reached: DataFrame = base.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min(col("us")).as("t"))
    var counts = reached.agg(count(lit(1)).as("stage_1_users"))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      reached = base.filter(col("event_type") === st)
        .join(reached.select(col("user_id"), col("t").as("prev")), "user_id")
        .filter(col("us") > col("prev"))
        .groupBy("user_id").agg(min(col("us")).as("t"))
      counts = counts.crossJoin(
        reached.agg(count(lit(1)).as(s"stage_${i + 1}_users")))
    }
    counts
  }

  /** Retention cohorts: users grouped by first-seen date; for each cohort
    * date and day offset 0..`maxOffsetDays`, how many cohort users were
    * active that day. Two hash aggregates and one join on user_id. */
  def retention(events: DataFrame, maxOffsetDays: Int = 7): DataFrame = {
    val cohorts = events.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort_date"))
    val active = events
      .select(col("user_id"), to_date(col("ts")).as("active_date")).distinct()
    active.join(cohorts, "user_id")
      .withColumn("day_offset", datediff(col("active_date"), col("cohort_date")))
      .filter(col("day_offset").between(0, maxOffsetDays))
      .groupBy("cohort_date", "day_offset")
      .agg(count(lit(1)).as("active_users"))
      .orderBy("cohort_date", "day_offset")
  }

  /** 0.8 and 0.9 as 12-hex-digit md5-prefix boundaries (0.8 = 0.ccc…₁₆,
    * 0.9 = 0.e66…₁₆): string comparison on the digest prefix IS the
    * fraction comparison, with no float arithmetic to mismatch anywhere.
    * Boundary bias < 2⁻⁴⁸. */
  val TrainBoundary = "cccccccccccc"
  val ValBoundary = "e66666666666"

  /** Deterministic train/val/test assignment (80/10/10) by content-free id
    * hash: stable under reruns, re-partitioning, and corpus growth — the
    * property a training-data split must have (a random() split is none of
    * those). Adds a `split` column. */
  def hashSplit(df: DataFrame, idCol: Column): DataFrame = {
    val prefix = substring(md5(idCol.cast("string")), 1, 12)
    df.withColumn("split",
      when(prefix < TrainBoundary, "train")
        .when(prefix < ValBoundary, "val")
        .otherwise("test"))
  }
}
