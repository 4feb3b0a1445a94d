package graft

import org.apache.spark.sql.functions._
import graft.model.{HistoricalVaR, ImpermanentLossModel, MEVExposureModel}

/** Ports of the reference's model tests
  * (/root/reference/tests/test_etl_pipeline.py:253-373) plus the invariant
  * properties as explicit asserts (SURVEY.md §5.2). */
class HistoricalVaRSpec extends SparkSpec {
  import spark.implicits._

  private def returnsDf(n: Int = 252, seed: Long = 42L) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, 0.001 + 0.03 * rng.nextGaussian()))
      .toDF("idx", "r")
  }

  test("compute basic: var > 0, cvar >= var, confidence echoed") {
    val result = new HistoricalVaR(returnsDf(), "r", 1000000.0).compute(0.95)
    assert(result.varUsd > 0)
    assert(result.cvarUsd >= result.varUsd)
    assert(result.confidence == 0.95)
    assert(result.returnsUsed == 252)
    assert(result.method == "historical_simulation")
  }

  test("higher confidence gives higher var") {
    val model = new HistoricalVaR(returnsDf(), "r", 1000000.0)
    assert(model.compute(0.99).varUsd >= model.compute(0.95).varUsd)
  }

  test("multi-day sqrt-of-time scaling") {
    val model = new HistoricalVaR(returnsDf(), "r", 1000000.0)
    val r1 = model.compute(horizonDays = 1)
    val r10 = model.compute(horizonDays = 10)
    assert(r10.varUsd > r1.varUsd)
    assert(math.abs(r10.varUsd - r1.varUsd * math.sqrt(10)) < 1e-6)
  }

  test("computeAll: one pass, bit-identical to per-spec compute calls") {
    val m = new HistoricalVaR(returnsDf(), "r", 1000000.0)
    val specs = Seq((0.95, 1), (0.99, 1), (0.95, 10))
    val all = m.computeAll(specs)
    val each = specs.map { case (c, h) => m.compute(c, h) }
    assert(all == each) // exact equality, doubles included
  }

  test("rolling var preserves series length and gates min_periods") {
    val model = new HistoricalVaR(returnsDf(100), "r")
    val rolling = model.rollingVar(window = 30).orderBy("idx")
    assert(rolling.count() == 100)
    // pandas min_periods = 15: rows 0..13 null, 14+ populated
    assert(rolling.filter(col("rolling_var").isNull).count() == 14)
  }

  test("stress test monotonic in shock") {
    val stress = new HistoricalVaR(returnsDf(), "r", 1000000.0)
      .stressTest(Seq(-0.10, -0.30, -0.50)).collect()
    assert(stress.length == 3)
    assert(stress(0).getAs[Double]("pnl_usd") > stress(2).getAs[Double]("pnl_usd"))
    assert(stress(2).getAs[Double]("position_remaining") == 500000.0)
  }

  test("empty series raises") {
    intercept[IllegalArgumentException] {
      new HistoricalVaR(Seq.empty[(Long, Double)].toDF("idx", "r"))
    }
  }

  test("quantile matches numpy linear interpolation") {
    // hand-checkable: [1..10] at q=0.05 → 1 + 0.45*(2-1) = 1.45
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("idx", "r")
    val q = df.agg(percentile(col("r"), lit(0.05))).collect()(0).getDouble(0)
    assert(math.abs(q - 1.45) < 1e-12)
  }
}

class ImpermanentLossSpec extends SparkSpec {

  test("no IL at entry price") {
    assert(math.abs(ImpermanentLossModel.compute(1000, 1000, 10000).ilPct) < 0.001)
  }

  test("IL negative on any price move") {
    assert(ImpermanentLossModel.compute(1000, 2000, 10000).ilPct < 0)
    assert(ImpermanentLossModel.compute(1000, 500, 10000).ilPct < 0)
  }

  test("larger move, more IL") {
    val il2 = ImpermanentLossModel.compute(1000, 2000, 10000)
    val il5 = ImpermanentLossModel.compute(1000, 5000, 10000)
    assert(il5.ilPct < il2.ilPct)
  }

  test("scan price range shape and unity point") {
    val df = ImpermanentLossModel.scanPriceRange(spark, 1000)
    assert(df.count() == 9)
    assert(df.columns.contains("il_pct"))
    assert(df.filter(col("price_ratio") === 1.0).count() == 1)
    val atUnity = df.filter(col("price_ratio") === 1.0)
      .select("il_pct").collect()(0).getDouble(0)
    assert(math.abs(atUnity) < 1e-9)
  }

  test("AMM symmetry: IL(r) == IL(1/r) by formula") {
    for (r <- Seq(0.1, 0.5, 2.0, 5.0, 10.0)) {
      val a = ImpermanentLossModel.compute(1000, 1000 * r).ilPct
      val b = ImpermanentLossModel.compute(1000, 1000 / r).ilPct
      assert(math.abs(a - b) < 1e-9, s"ratio $r")
    }
  }
}

class MEVExposureSpec extends SparkSpec {
  import spark.implicits._

  private def frames = {
    val tx = Seq(
      (100L, 50.0, true), (100L, 200.0, true), (100L, 55.0, false),
      (101L, 60.0, true))
      .toDF("block_number", "gas_price_gwei", "is_defi_tx")
    val swaps = Seq(
      (100L, "0xpool1", "uniswap_v2"), (100L, "0xpool1", "uniswap_v2"),
      (100L, "0xpool2", "uniswap_v2"))
      .toDF("block_number", "pool", "protocol")
    (tx, swaps)
  }

  test("score block in [0,100] with expected components") {
    val (tx, swaps) = frames
    val r = new MEVExposureModel(tx, Some(swaps)).scoreBlock(100L)
    assert(r.mevScore >= 0 && r.mevScore <= 100)
    // block 100: gas med 55, max 200 → frontrun min(100,(200/55-1)*20)≈52.73
    assert(math.abs(r.frontrunRisk - 52.73) < 0.01)
    // pool1 has 2 swaps (≥2 → backrun 1; <3 → sandwich 0)
    assert(r.sandwichRisk == 0.0)
    assert(r.backrunOpportunities == 1)
    // composite = 0.5*0 + 0.4*52.72... + 2*1
    assert(math.abs(r.mevScore - (0.4 * (200.0 / 55.0 - 1) * 20 + 2)) < 0.01)
  }

  test("higher gas variance raises frontrun risk") {
    val low = Seq((100L, 50.0), (100L, 51.0), (100L, 52.0))
      .toDF("block_number", "gas_price_gwei")
    val high = Seq((100L, 50.0), (100L, 500.0), (100L, 52.0))
      .toDF("block_number", "gas_price_gwei")
    val rLow = new MEVExposureModel(low).scoreBlock(100L)
    val rHigh = new MEVExposureModel(high).scoreBlock(100L)
    assert(rHigh.frontrunRisk >= rLow.frontrunRisk)
  }

  test("score all blocks covers every tx block") {
    val (tx, swaps) = frames
    val scores = new MEVExposureModel(tx, Some(swaps)).scoreAllBlocks()
    val blocks = scores.select("block_number").collect().map(_.getLong(0)).toSet
    assert(blocks == Set(100L, 101L))
    // all scores clamped
    assert(scores.filter(col("mev_score") < 0 || col("mev_score") > 100).count() == 0)
  }

  test("sandwich risk triggers at 3 same-pool swaps") {
    val tx = Seq((100L, 50.0)).toDF("block_number", "gas_price_gwei")
    val swaps = Seq((100L, "0xp", "v2"), (100L, "0xp", "v2"), (100L, "0xp", "v2"))
      .toDF("block_number", "pool", "protocol")
    val r = new MEVExposureModel(tx, Some(swaps)).scoreBlock(100L)
    assert(r.sandwichRisk == 25.0)
    assert(r.backrunOpportunities == 1)
  }

  test("empty frames score zero") {
    val tx = Seq.empty[(Long, Double)].toDF("block_number", "gas_price_gwei")
    val r = new MEVExposureModel(tx).scoreBlock(100L)
    assert(r.mevScore == 0.0)
  }
}
