package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl._
import graft.model.{HistoricalVaR, ImpermanentLossModel, MEVExposureModel}
import graft.sql.CanonicalQueries

/** Domain-layer operators exposed through the driver contract. These run the
  * real ETL/model code over the deterministic envelope fixtures
  * ([[graft.etl.Fixtures]]) — the fixture data never touches the driver's
  * parquet tables, so these entries have no DuckDB oracle and get the
  * driver's rows-only check; exact-value coverage lives in the ScalaTest
  * suites (src/test/scala/graft) and in the events-table analogs in
  * [[Relational]].
  */
object Domain {
  type Q = (SparkSession, String) => DataFrame

  private def transfers(s: SparkSession): DataFrame =
    TokenTransferDecoder.decode(
      Ingest.parseRaw(s, Fixtures.syntheticTransferMessages(200)))

  private def transactions(s: SparkSession): DataFrame = {
    val env = Ingest.parseRaw(s, Fixtures.syntheticTxMessages(120))
    TransactionFeatureEngineer.engineer(
      env.filter(col("event_type") === "transaction")
        .select(col("payload.*"), col("block_number"),
          col("block_timestamp"), col("chain_id")))
  }

  private def swaps(s: SparkSession): DataFrame = {
    val e18 = BigInt(10).pow(18)
    val rng = new scala.util.Random(11)
    val msgs = (0 until 90).map { i =>
      val pool = "0x" + "e" * 39 + Integer.toHexString(rng.nextInt(4))
      Fixtures.swapMessage(
        pool = pool,
        amount0In = BigInt((1 + rng.nextInt(1000)).toLong) * e18,
        amount1Out = BigInt((1 + rng.nextInt(3000)).toLong) * e18,
        blockNumber = 19000000L + (i / 3) * 10L,
        ts = Fixtures.FixedNow - 1800 + i * 20)
    }
    DeFiSwapParser.parse(Ingest.parseRaw(s, msgs))
  }

  private val decodeTransfers: Q = (s, _) =>
    transfers(s).orderBy("block_number", "tx_hash", "from")

  private val parseSwaps: Q = (s, _) =>
    swaps(s).orderBy("block_number", "pool", "price")

  private val txFeatures: Q = (s, _) =>
    transactions(s).select("block_number", "nonce", "gas_price_gwei",
      "value_eth", "fn_name", "is_defi_tx", "gas_p90", "is_high_priority")
      .orderBy("block_number", "nonce")

  private val blockAgg: Q = (s, _) =>
    TransactionFeatureEngineer.aggregateByBlock(transactions(s))

  private val transferVolume: Q = (s, _) =>
    CanonicalQueries.transferVolume(transfers(s))
      .orderBy(desc("hour_bucket"), col("token_contract"))

  private val swapPriceImpact: Q = (s, _) =>
    CanonicalQueries.swapPriceImpact(swaps(s)).orderBy("pool")

  private def returnsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    val rng = new scala.util.Random(42)
    (0 until 90).map(i => (i.toLong, 0.001 + 0.032 * rng.nextGaussian()))
      .toDF("idx", "r")
  }

  private val varCompute: Q = (s, _) => {
    import s.implicits._
    val m = new HistoricalVaR(returnsDf(s), "r", 1000000.0)
    Seq(m.compute(0.95), m.compute(0.99), m.compute(0.95, horizonDays = 10))
      .toDF().orderBy("confidence", "horizonDays")
  }

  private val rollingVar: Q = (s, _) =>
    new HistoricalVaR(returnsDf(s), "r", 1000000.0)
      .rollingVar(window = 30).orderBy("idx")

  private val stressTest: Q = (s, _) =>
    new HistoricalVaR(returnsDf(s), "r", 1000000.0)
      .stressTest(Seq(-0.10, -0.20, -0.30, -0.50)).orderBy(desc("shock_pct"))

  private val ilScan: Q = (s, _) =>
    ImpermanentLossModel.scanPriceRange(s, 2000.0, 10000.0,
      (2 to 100).map(r => math.rint(r * 0.05 * 100) / 100))
      .orderBy("price_ratio")

  private val mevScores: Q = (s, _) => {
    val tx = transactions(s)
    val sw = swaps(s)
    new MEVExposureModel(tx, Some(sw)).scoreAllBlocks()
  }

  val queries: Map[String, Q] = Map(
    "etl_decode_transfers"  -> decodeTransfers,
    "etl_parse_swaps"       -> parseSwaps,
    "etl_tx_features"       -> txFeatures,
    "etl_block_agg"         -> blockAgg,
    "etl_transfer_volume"   -> transferVolume,
    "etl_swap_price_impact" -> swapPriceImpact,
    "model_var_compute"     -> varCompute,
    "model_rolling_var"     -> rollingVar,
    "model_stress_test"     -> stressTest,
    "model_il_scan"         -> ilScan,
    "model_mev_scores"      -> mevScores,
  )

  /** No DuckDB oracles: fixture inputs aren't visible to the oracle's
    * parquet tables. */
  val oracleSql: Map[String, String] = Map()
}
