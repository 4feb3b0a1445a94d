package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.schema.{ImpermanentLossResult, MEVRiskResult, VaRResult}

/** Historical-simulation VaR & CVaR
  * (/root/reference/src/models/risk_models.py:58-143).
  *
  * The returns series is a DataFrame with a value column (and an order
  * column for the rolling variant) — at scale this is a partitioned table,
  * not a driver-side array. `compute` is a single two-aggregate pass: the
  * interpolated quantile and the conditional tail mean share one plan via a
  * broadcast cross join of the 1-row quantile frame (SURVEY.md A10/A11).
  */
class HistoricalVaR(returns: DataFrame, valueCol: String = "r",
                    positionSize: Double = 1000000.0) {

  private val clean = returns.na.drop(Seq(valueCol))
  require(!clean.isEmpty, "Returns series cannot be empty.")

  def compute(confidence: Double = 0.95, horizonDays: Int = 1,
              scaleBySqrt: Boolean = true): VaRResult =
    computeAll(Seq((confidence, horizonDays)), scaleBySqrt).head

  /** Every (confidence, horizonDays) pair in ONE pass over the returns:
    * `percentile(v, array(...))` evaluates all quantiles in a single
    * aggregate, and all conditional tail means share one
    * broadcast-quantile second aggregate — 2 jobs total regardless of how
    * many specs, vs 2 per [[compute]] call. At 100 TB the returns scan is
    * the cost; this reads it twice instead of 2·|specs| times. Values are
    * bit-identical to per-spec [[compute]] calls (same quantile
    * evaluation, same decimal-exact tail mean, same driver arithmetic). */
  def computeAll(specs: Seq[(Double, Int)],
                 scaleBySqrt: Boolean = true): Seq[VaRResult] = {
    require(specs.nonEmpty)
    val v = col(valueCol)
    val ps = specs.map(s => 1 - s._1).distinct
    val qdf = clean.agg(percentile(v, typedlit(ps)).as("qs"), count(v).as("n"))
    val tails = ps.indices.map(i =>
      graft.queries.Num.davg(when(v <= element_at(col("qs"), i + 1), v))
        .as(s"t$i"))
    val row = clean.crossJoin(broadcast(qdf))
      .agg(first(col("qs")).as("qs"),
        (first(col("n")).as("n") +: tails): _*)
      .collect()(0)
    val qs = row.getSeq[Double](0)
    val n = row.getLong(1)
    specs.map { case (conf, horizonDays) =>
      val i = ps.indexOf(1 - conf)
      var varPct = -qs(i)
      var cvarPct = -row.getDouble(2 + i)
      if (scaleBySqrt && horizonDays > 1) {
        val s = math.sqrt(horizonDays.toDouble)
        varPct *= s; cvarPct *= s
      }
      VaRResult(conf, horizonDays, varPct * positionSize,
        cvarPct * positionSize, n, "historical_simulation")
    }
  }

  /** Rolling 1-day VaR (risk_models.py:110-122): window `window`,
    * min_periods = window/2 (pandas semantics: null below the threshold),
    * exact interpolated quantile.
    *
    * The global-order form runs DISTRIBUTED by default (halo exchange,
    * [[graft.queries.DistributedRolling]] — bit-identical to the
    * single-partition window, parallel instead of one O(n·w) task). Pass
    * `partitionCols` when the series is domain-sharded, or
    * `distribute = false` for the plain global window (lazy, tiny-data). */
  def rollingVar(window: Int = 30, confidence: Double = 0.95,
                 orderCol: String = "idx",
                 partitionCols: Seq[String] = Nil,
                 distribute: Boolean = true): DataFrame = {
    val minPeriods = window / 2
    def features(w: org.apache.spark.sql.expressions.WindowSpec) = Seq(
      "rolling_var" ->
        when(count(col(valueCol)).over(w) >= minPeriods,
          percentile(col(valueCol), lit(1 - confidence)).over(w) * (-positionSize)))
    if (partitionCols.isEmpty && distribute && !clean.isStreaming)
      graft.queries.DistributedRolling.withRolling(clean, Seq(orderCol), window)(features)
    else {
      val base = if (partitionCols.isEmpty) Window.partitionBy()
                 else Window.partitionBy(partitionCols.map(col): _*)
      val w = base.orderBy(orderCol).rowsBetween(-(window - 1), Window.currentRow)
      features(w).foldLeft(clean) { case (d, (name, c)) => d.withColumn(name, c) }
    }
  }

  /** Hypothetical shock P&L table (risk_models.py:124-143): a literal-driven
    * generator — rows from a Seq, pure column math. */
  def stressTest(shockPcts: Seq[Double] = Seq(-0.10, -0.20, -0.30, -0.50, -0.80)): DataFrame = {
    val spark = returns.sparkSession
    import spark.implicits._
    shockPcts.toDF("shock")
      .select(
        (col("shock") * 100).as("shock_pct"),
        (col("shock") * positionSize).as("pnl_usd"),
        (lit(positionSize) + col("shock") * positionSize).as("position_remaining"))
  }
}

/** Constant-product AMM impermanent loss
  * (/root/reference/src/models/risk_models.py:150-204).
  * IL = 2·√r/(1+r) − 1 with r = price_current/price_entry. Offered both as a
  * scalar (driver-side math for API shaping) and as a columnar scan over a
  * ratio grid (explode of a literal sequence — M6).
  */
object ImpermanentLossModel {

  def compute(priceEntry: Double, priceCurrent: Double,
              initialUsdValue: Double = 10000.0): ImpermanentLossResult = {
    val r = priceCurrent / priceEntry
    val lpRelative = 2 * math.sqrt(r) / (1 + r)
    val ilPct = lpRelative - 1
    val holdValue = initialUsdValue * (1 + r) / 2
    val lpValue = initialUsdValue * lpRelative
    ImpermanentLossResult(r, ilPct * 100, holdValue, lpValue, lpValue - holdValue)
  }

  val DefaultRatios: Seq[Double] = Seq(0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 3.0, 5.0, 10.0)

  /** IL across a ratio grid (risk_models.py:182-204): rows generated from a
    * literal Seq, all metrics as column expressions. */
  def scanPriceRange(spark: SparkSession, priceEntry: Double,
                     initialUsd: Double = 10000.0,
                     ratios: Seq[Double] = DefaultRatios): DataFrame = {
    import spark.implicits._
    val r = col("price_ratio")
    val lpRel = lit(2) * sqrt(r) / (lit(1) + r)
    ratios.toDF("price_ratio")
      .select(
        r,
        (lit(priceEntry) * r).as("price_current"),
        ((lpRel - 1) * 100).as("il_pct"),
        (lit(initialUsd) * lpRel).as("lp_value"),
        (lit(initialUsd) * (lit(1) + r) / 2).as("hold_value"))
      .withColumn("loss_usd", col("lp_value") - col("hold_value"))
  }
}

/** MEV exposure scoring (/root/reference/src/models/risk_models.py:211-284).
  *
  * The reference loops over blocks in Python, filtering both frames per block
  * (risk_models.py:273-274) — O(blocks × rows). Here the same numbers come
  * from two hash aggregates and one left join (SURVEY.md J1/A8): per-block
  * gas stats from transactions, per-(block,pool) swap counts rolled up to
  * per-block signals, joined on block_number. Scales to any block count.
  */
class MEVExposureModel(txDf: DataFrame, swapDf: Option[DataFrame] = None) {

  private def swapSignals: Option[DataFrame] = swapDf.map { sw =>
    sw.groupBy("block_number", "pool").count()
      .groupBy("block_number").agg(
        sum(when(col("count") >= 3, 1).otherwise(0)).as("high_activity_pools"),
        sum(when(col("count") >= 2, 1).otherwise(0)).as("backrun_pools"))
  }

  /** Per-block gas max + exact median. The median is rank-based — sort
    * within the block partition, pick the two middle non-null rows, and
    * interpolate `l + (h−l)·0.5` — which is value-identical to
    * `percentile(gas, 0.5)` (same formula, Percentile.getPercentile) but
    * stays fully codegen'd: the exact-`percentile` hash aggregate is a
    * TypedImperativeAggregate that falls back to sort-based aggregation
    * past 128 groups and serializes a growable buffer per row (measured
    * 122 s at sf0.1 vs 2.9 s for the plain aggs next to it). One hash
    * exchange on block_number feeds both the window pass and the final
    * aggregate. A block whose gas values are all null keeps its row (null
    * median), preserving the tx frame's block universe. */
  private def txSignals: DataFrame = {
    val byBlock = Window.partitionBy("block_number")
    val ord = byBlock.orderBy(col("gas_price_gwei").asc_nulls_first)
    val gas = col("gas_price_gwei")
    // nulls sort first, so the 1-based index among non-null rows is
    // rn − (#rows − #non-null); the two middle positions are ⌊(n+1)/2⌋ and
    // ⌊n/2⌋+1 (equal when n is odd)
    val k = col("__rn") - (col("__nt") - col("__nn"))
    val lo = floor((col("__nn") + 1) / 2)
    val hi = floor(col("__nn") / 2) + 1
    txDf
      .select(col("block_number"), gas)
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__nn", count(gas).over(byBlock))
      .withColumn("__nt", count(lit(1)).over(byBlock))
      .withColumn("__gmax", max(gas).over(byBlock))
      .filter((col("__nn") > 0 && (k === lo || k === hi)) ||
              (col("__nn") === 0 && col("__rn") === 1))
      .groupBy("block_number")
      .agg(max(col("__gmax")).as("gas_max"),
           min(gas).as("__l"), max(gas).as("__h"))
      .withColumn("gas_med", col("__l") + (col("__h") - col("__l")) * 0.5)
      .select("block_number", "gas_max", "gas_med")
  }

  /** Composite per-block scores: min(100, 0.5·sandwich + 0.4·frontrun +
    * 2·backrun), components rounded to 2dp (risk_models.py:234-242). The
    * block universe is the transaction frame's blocks, as in the reference's
    * `score_all_blocks` (risk_models.py:269-274). */
  def scoreAllBlocks(): DataFrame = {
    val joined = swapSignals match {
      case Some(sig) => txSignals.join(sig, Seq("block_number"), "left")
      case None => txSignals
        .withColumn("high_activity_pools", lit(null).cast("long"))
        .withColumn("backrun_pools", lit(null).cast("long"))
    }
    val sandwich = least(lit(100.0), coalesce(col("high_activity_pools"), lit(0L)) * 25.0)
    val frontrun = when(col("gas_med").isNull || col("gas_med") === 0.0, 0.0)
      .otherwise(least(lit(100.0),
        greatest(lit(0.0), (col("gas_max") / col("gas_med") - 1) * 20)))
    val backrun = coalesce(col("backrun_pools"), lit(0L)).cast("int")
    joined
      .withColumn("sandwich_risk", round(sandwich, 2))
      .withColumn("frontrun_risk", round(frontrun, 2))
      .withColumn("backrun_opportunities", backrun)
      .withColumn("mev_score",
        round(least(lit(100.0),
          sandwich * 0.5 + frontrun * 0.4 + backrun * 2), 2))
      .select("block_number", "mev_score", "sandwich_risk", "frontrun_risk",
        "backrun_opportunities")
      .orderBy("block_number")
  }

  /** Single-block score (risk_models.py:225-242). Unlike `scoreAllBlocks`,
    * a block absent from the tx frame still gets its swap-side signals —
    * mirroring the reference's per-block filters. */
  def scoreBlock(blockNumber: Long): MEVRiskResult = {
    val txB = txDf.filter(col("block_number") === blockNumber)
    val swB = swapDf.map(_.filter(col("block_number") === blockNumber))
    val model = new MEVExposureModel(txB, swB)
    val fromTx = model.scoreAllBlocks().collect()
    if (fromTx.nonEmpty) {
      val r = fromTx(0)
      MEVRiskResult(r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4))
    } else {
      // no transactions in the block: frontrun=0, swap signals may remain
      val (sand, back) = swB match {
        case Some(sw) =>
          val counts = sw.groupBy("pool").count()
            .agg(
              sum(when(col("count") >= 3, 1).otherwise(0)).as("hi"),
              sum(when(col("count") >= 2, 1).otherwise(0)).as("bk"))
            .collect()(0)
          if (counts.isNullAt(0)) (0.0, 0)
          else (math.min(100.0, counts.getLong(0) * 25.0), counts.getLong(1).toInt)
        case None => (0.0, 0)
      }
      val composite = math.min(100.0, sand * 0.5 + back * 2)
      MEVRiskResult(blockNumber,
        math.rint(composite * 100) / 100, math.rint(sand * 100) / 100, 0.0, back)
    }
  }
}
