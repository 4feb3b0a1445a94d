package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order ranking without a global window.
  *
  * `Window.orderBy` with no partition funnels the ENTIRE table through one
  * task (Exchange SinglePartition) — fine at sf0.1, fatal at 100 TB. The
  * classic fix is a two-pass histogram rank:
  *
  *   pass 1 — count rows per coarse bucket of the order key (a parallel
  *            partial+final agg whose result is O(#buckets), collected on
  *            the driver like a broadcast variable);
  *   pass 2 — rank within each bucket via a bucket-PARTITIONED window (a
  *            parallel hash exchange) and add the cumulative count of all
  *            lower buckets from pass 1.
  *
  * The bucket function is a pure expression of the row, so the two passes
  * agree without persisting anything (unlike `repartitionByRange`, whose
  * sampled boundaries can differ between jobs). Bucket width is the
  * parallelism lever: at larger scale pick a narrower band so #buckets
  * tracks the cluster's task count; the driver-side offset table stays
  * O(#buckets), the same scalar boundary as a codebook collect.
  */
object DistributedRank {

  /** Adds a 1-based gapless `rank` column ordered by `orderCols` (which
    * must be a total order — include a unique tiebreaker). `bucket` must be
    * a monotone function of the leading order column (rows in a lower
    * bucket order strictly before rows in a higher one). Returns the ranked
    * frame and the total row count. */
  def withRank(df: DataFrame, bucket: Column,
               orderCols: Seq[Column]): (DataFrame, Long) = {
    val bucketed = df.withColumn("__bucket", bucket.cast("long"))
    val rawCounts = bucketed.groupBy("__bucket").count().collect()
    // a null bucket would alias into key 0 (getLong(null) == 0) and shift
    // every higher bucket's offset — corrupt ranks, silently
    require(rawCounts.forall(!_.isNullAt(0)),
      "bucket expression must be non-null on every row")
    val counts = rawCounts.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    if (counts.isEmpty)
      return (bucketed.drop("__bucket").withColumn("rank", lit(0L)), 0L)
    var below = 0L
    val offsets: Map[Long, Long] = counts.map { case (b, c) =>
      val entry = b -> below; below += c; entry
    }.toMap
    val w = Window.partitionBy("__bucket").orderBy(orderCols: _*)
    val ranked = bucketed
      .withColumn("rank",
        row_number().over(w).cast("long") +
          element_at(typedlit(offsets), col("__bucket")))
      .drop("__bucket")
    (ranked, below)
  }

  /** `ntile(tiles)` reconstructed from a gapless rank and the total count:
    * the first `n % tiles` tiles hold `ceil(n/tiles)` rows, the rest
    * `floor(n/tiles)` — identical to the window function's division. */
  def ntileFromRank(rank: Column, n: Long, tiles: Int): Column = {
    val q = n / tiles
    val rem = n % tiles
    // q == 0 (n < tiles) keeps every rank inside the when-branch: rem = n
    // and q + 1 = 1, so rank <= rem * (q + 1) = n always holds
    when(rank <= lit(rem * (q + 1)),
      floor((rank - 1) / lit((q + 1).toDouble)) + 1)
      .otherwise(lit(rem) +
        floor((rank - lit(rem * (q + 1)) - 1) / lit(q.toDouble)) + 1)
      .cast("long")
  }

  /** `percent_rank()` from a gapless rank over a total (tie-free) order:
    * (rank - 1) / (n - 1), and 0 for a single-row frame. */
  def percentRankFromRank(rank: Column, n: Long): Column =
    if (n <= 1L) lit(0.0)
    else (rank - 1).cast("double") / lit((n - 1).toDouble)
}
