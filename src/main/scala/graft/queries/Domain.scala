package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl._
import graft.functions.Keccak256
import graft.model.{HistoricalVaR, ImpermanentLossModel, MEVExposureModel}
import graft.sql.CanonicalQueries

/** Domain-layer operators exposed through the driver contract.
  *
  * Since round 3 these run the real ETL/model code over envelope JSON
  * *derived from the driver's `events` parquet* ([[graft.etl.EventEnvelopes]])
  * instead of Scala-generated fixtures — so every entry has a DuckDB oracle
  * twin that recomputes the decode arithmetic directly from the events
  * columns (it never sees the JSON; the Spark side round-trips through the
  * REAL parse → decode path). EIP-55 checksum casing is not SQL-expressible,
  * so the 16 sender / 16 receiver addresses have their checksummed forms
  * embedded as literals (computed by [[graft.functions.Keccak256]] at SQL
  * build time — the same deterministic-constant trick as the ANN plane
  * matrix). Envelope-fixture exactness ([[graft.etl.Fixtures]]) stays
  * covered by the ScalaTest suites.
  *
  * Cross-engine float rules (see Num's scaladoc): sums/avgs of doubles are
  * ROUND(6)-ed on both sides (order-dependent last-ulp), quantile
  * interpolation `l + frac·(h−l)` is bit-identical, and every remaining
  * expression is mirrored operation-for-operation.
  */
object Domain {
  type Q = (SparkSession, String) => DataFrame

  /** The driver parquet is one small file per table, so the scan is ONE
    * input partition and the parse→decode chain would run on a single core.
    * A real deployment reads thousands of files (or a Kafka topic with many
    * partitions); this round-robin repartition stands in for that layout so
    * the decode parallelizes — the shuffle payload is just the compact
    * envelope strings. */
  private def spread(env: org.apache.spark.sql.Dataset[String]) =
    env.repartition(env.sparkSession.sparkContext.defaultParallelism)

  private def transfers(s: SparkSession, dir: String): DataFrame =
    TokenTransferDecoder.decode(
      Ingest.parseRaw(spread(EventEnvelopes.transferEnvelopes(Tables.events(s, dir)))))

  private def txFrame(s: SparkSession, dir: String): DataFrame = {
    val env = Ingest.parseRaw(spread(EventEnvelopes.txEnvelopes(Tables.events(s, dir))))
    env.filter(col("event_type") === "transaction")
      .select(col("payload.*"), col("block_number"),
        col("block_timestamp"), col("chain_id"))
  }

  /** Full feature set incl. the rolling gas p90 — distributed-window, so
    * building it is EAGER (rank pass); only the entries that actually read
    * `gas_p90`/`is_high_priority` pay for it. */
  private def transactions(s: SparkSession, dir: String): DataFrame =
    TransactionFeatureEngineer.engineer(txFrame(s, dir))

  /** Per-row features only — per-block aggregation and MEV scoring never
    * read the rolling columns, so they must not carry the window. */
  private def transactionsBase(s: SparkSession, dir: String): DataFrame =
    TransactionFeatureEngineer.engineerBase(txFrame(s, dir))

  private def swaps(s: SparkSession, dir: String): DataFrame =
    DeFiSwapParser.parse(
      Ingest.parseRaw(spread(EventEnvelopes.swapEnvelopes(Tables.events(s, dir)))))

  // -------------------------------------------------- oracle SQL building
  // DuckDB twins of the EventEnvelopes derivations. Every formula below is
  // the SQL mirror of a column expression in EventEnvelopes — change them
  // together.

  private def hexd(d: Long) = java.lang.Long.toHexString(d)

  /** EIP-55 literals for the 16 derived senders/receivers. */
  private def addrCase(selector: String, base: Char): String = {
    val whens = (0 until 16).map { d =>
      val cs = Keccak256.toChecksumAddress("0x" + base.toString * 39 + hexd(d))
      s"WHEN $d THEN '$cs'"
    }.mkString(" ")
    s"CASE ($selector) $whens END"
  }

  private val contractCase = {
    val erc20 = Fixtures.Contracts.zipWithIndex
      .map { case (c, i) => s"WHEN $i THEN '$c'" }.mkString(" ")
    val nft = Fixtures.NftContracts.zipWithIndex
      .map { case (c, i) => s"WHEN $i THEN '$c'" }.mkString(" ")
    s"CASE WHEN is_nft THEN (CASE (user_id % 2) $nft END) " +
      s"ELSE (CASE (user_id % 4) $erc20 END) END"
  }

  private val transfersCte =
    """t AS (
      |  SELECT event_id, user_id, value,
      |    (event_type = 'signup') AS is_nft,
      |    19000000 + (event_id // 5) * 10 AS block_number,
      |    1700000000 - ((event_id * 37) % 86400) AS ts_sec,
      |    CAST(trunc(value * 1e15) AS BIGINT) AS amount_wei
      |  FROM events
      |)""".stripMargin

  private val swapsCte =
    """s AS (
      |  SELECT event_id, user_id, value,
      |    19000000 + (event_id // 3) * 10 AS block_number,
      |    1700000000 - (event_id % 3000) AS ts_sec,
      |    CAST(trunc(value * 1e15) AS BIGINT) + 1 AS a0in,
      |    CAST(trunc(value * (2.0e15 + (user_id % 150) * 1e13)) AS BIGINT) + 1 AS a1out
      |  FROM events WHERE event_type = 'purchase'
      |)""".stripMargin

  private val txCte =
    """x AS (
      |  SELECT event_id, user_id, value,
      |    19000000 + (event_id // 5) * 10 AS block_number,
      |    event_id AS nonce,
      |    15000000000 + CAST(trunc(value * 1e9) AS BIGINT) AS gas_price_wei,
      |    CAST(trunc(value * 1e16) AS BIGINT) AS value_wei,
      |    (user_id % 20 = 0) AS is_deploy,
      |    (user_id % 3) AS sel
      |  FROM events WHERE event_type IN ('click', 'view')
      |), f AS (
      |  SELECT block_number, nonce,
      |    CAST(gas_price_wei AS DOUBLE) / 1e9 AS gas_price_gwei,
      |    CAST(value_wei AS DOUBLE) / 1e18 AS value_eth,
      |    CASE sel WHEN 0 THEN 'ERC20.transfer' WHEN 1 THEN 'ERC20.approve'
      |      ELSE 'unknown' END AS fn_name,
      |    (sel <> 2) AS is_defi_tx,
      |    is_deploy
      |  FROM x
      |)""".stripMargin

  // --------------------------------------------------------------- queries
  // Contract-layer representation rule: uint256 columns cross the contract
  // boundary as canonical decimal STRINGS ("1000"), exactly like the
  // reference carries big ints as strings on the wire
  // (/root/reference/src/ingestion/kafka_producer.py:187-191). Inside the
  // engine they stay DECIMAL(38,0) (CanonicalQueries sums them exactly);
  // the string cast happens only here because DECIMAL(38,0)/HUGEINT render
  // as float64 through DuckDB's pandas bridge ("1000.0") while Spark parquet
  // yields Decimal ("1000") — value-equal, hash-divergent. The float
  // `amount`/`price` semantics are untouched.
  private val decodeTransfers: Q = (s, dir) =>
    transfers(s, dir)
      .withColumn("token_id", col("token_id").cast("string"))
      .withColumn("amount_raw", col("amount_raw").cast("string"))
      .orderBy("block_number", "tx_hash")

  private val decodeTransfersSql =
    s"""WITH $transfersCte
       |SELECT
       |  CASE WHEN is_nft THEN 'ERC-721' ELSE 'ERC-20' END AS standard,
       |  $contractCase AS contract,
       |  ${addrCase("user_id % 16", 'a')} AS "from",
       |  ${addrCase("(user_id // 16) % 16", 'b')} AS "to",
       |  CASE WHEN is_nft THEN CAST(event_id AS VARCHAR) END AS token_id,
       |  CASE WHEN is_nft THEN printf('%x', event_id) END AS token_id_hex,
       |  CASE WHEN is_nft THEN '1'
       |    ELSE CAST(amount_wei AS VARCHAR) END AS amount_raw,
       |  block_number,
       |  make_timestamp(ts_sec * 1000000) AS block_timestamp,
       |  '0x' || md5('tx' || CAST(event_id AS VARCHAR)) AS tx_hash,
       |  1 AS chain_id,
       |  CASE WHEN is_nft THEN CAST(1 AS DOUBLE)
       |    ELSE CAST(amount_wei AS DOUBLE) END AS amount
       |FROM t ORDER BY block_number, tx_hash""".stripMargin

  private val parseSwaps: Q = (s, dir) =>
    swaps(s, dir)
      .withColumn("amount0_in",  col("amount0_in").cast("string"))
      .withColumn("amount1_in",  col("amount1_in").cast("string"))
      .withColumn("amount0_out", col("amount0_out").cast("string"))
      .withColumn("amount1_out", col("amount1_out").cast("string"))
      .orderBy("block_number", "tx_hash")

  private val parseSwapsSql =
    s"""WITH $swapsCte
       |SELECT 'uniswap_v2' AS protocol,
       |  '0x' || repeat('e', 39) || printf('%x', user_id % 4) AS pool,
       |  CAST(a0in AS VARCHAR) AS amount0_in,
       |  '0' AS amount1_in,
       |  '0' AS amount0_out,
       |  CAST(a1out AS VARCHAR) AS amount1_out,
       |  CAST(a1out AS DOUBLE) / CAST(a0in AS DOUBLE) AS price,
       |  block_number,
       |  make_timestamp(ts_sec * 1000000) AS block_timestamp,
       |  1 AS chain_id,
       |  '0x' || md5('sw' || CAST(event_id AS VARCHAR)) AS tx_hash
       |FROM s ORDER BY block_number, tx_hash""".stripMargin

  private val txFeatures: Q = (s, dir) =>
    transactions(s, dir)
      .select(col("block_number"), col("nonce"), col("gas_price_gwei"),
        col("value_eth"), col("fn_name"), col("is_defi_tx"),
        round(col("gas_p90"), 6).as("gas_p90"), col("is_high_priority"))
      .orderBy("block_number", "nonce")

  private val txFeaturesSql =
    s"""WITH $txCte, w AS (
       |  SELECT *, quantile_cont(gas_price_gwei, 0.9) OVER (
       |    ORDER BY block_number, nonce
       |    ROWS BETWEEN 99 PRECEDING AND CURRENT ROW) AS p90
       |  FROM f
       |)
       |SELECT block_number, nonce, gas_price_gwei, value_eth, fn_name,
       |  is_defi_tx, ROUND(p90, 6) AS gas_p90,
       |  (gas_price_gwei > p90) AS is_high_priority
       |FROM w ORDER BY block_number, nonce""".stripMargin

  private val blockAgg: Q = (s, dir) =>
    TransactionFeatureEngineer.aggregateByBlock(transactionsBase(s, dir))
      .withColumn("total_eth_volume", round(col("total_eth_volume"), 6))
      .withColumn("avg_gas_price_gwei", round(col("avg_gas_price_gwei"), 6))

  private val blockAggSql =
    s"""WITH $txCte
       |SELECT block_number,
       |  COUNT(*) AS tx_count,
       |  ROUND(SUM(value_eth), 6) AS total_eth_volume,
       |  ROUND(AVG(gas_price_gwei), 6) AS avg_gas_price_gwei,
       |  MAX(gas_price_gwei) AS max_gas_price_gwei,
       |  CAST(SUM(CASE WHEN is_defi_tx THEN 1 ELSE 0 END) AS BIGINT) AS defi_tx_count,
       |  CAST(SUM(CASE WHEN is_deploy THEN 1 ELSE 0 END) AS BIGINT) AS contract_deploys
       |FROM f GROUP BY block_number ORDER BY block_number""".stripMargin

  /** `:now` of the derived feed is known (EventEnvelopes.NowSec, the max
    * block_timestamp by construction) — passing it skips the max() job that
    * would otherwise execute the whole parse→decode DAG a second time. */
  private def feedNow = Some(new java.sql.Timestamp(EventEnvelopes.NowSec * 1000L))

  /** The 2×COUNT(DISTINCT) expand rewrite multiplies its input 3×; without
    * a lineage cut that re-runs the whole JSON-parse→keccak→decode chain
    * per copy (measured 34 s vs 5.2 s for the decode alone at sf0.1).
    * localCheckpoint materializes the decoded rows once — the narrow,
    * already-filtered frame — and the expand reads the cached copy. */
  private val transferVolume: Q = (s, dir) =>
    CanonicalQueries.transferVolume(transfers(s, dir).localCheckpoint(), feedNow)
      .withColumn("volume_normalized", round(col("volume_normalized"), 6))
      .orderBy(desc("hour_bucket"), col("token_contract"))

  private val transferVolumeSql = {
    val erc20Case = Fixtures.Contracts.zipWithIndex
      .map { case (c, i) => s"WHEN $i THEN '$c'" }.mkString(" ")
    s"""WITH $transfersCte
       |SELECT date_trunc('hour', make_timestamp(ts_sec * 1000000)) AS hour_bucket,
       |  CASE (user_id % 4) $erc20Case END AS token_contract,
       |  'ERC-20' AS token_standard,
       |  1 AS chain_id,
       |  COUNT(*) AS transfer_count,
       |  ROUND(SUM(CAST(amount_wei AS DOUBLE) / 1e18), 6) AS volume_normalized,
       |  COUNT(DISTINCT (user_id % 16)) AS unique_senders,
       |  COUNT(DISTINCT ((user_id // 16) % 16)) AS unique_receivers
       |FROM t WHERE NOT is_nft
       |GROUP BY 1, 2, 3, 4
       |ORDER BY hour_bucket DESC, token_contract""".stripMargin
  }

  private val swapPriceImpact: Q = (s, dir) =>
    CanonicalQueries.swapPriceImpact(swaps(s, dir), feedNow)
      .withColumn("avg_price", round(col("avg_price"), 6))
      .withColumn("price_volatility", round(col("price_volatility"), 6))
      // exact decimal sum inside, canonical string across the contract
      .withColumn("total_volume_token0", col("total_volume_token0").cast("string"))
      .orderBy("pool")

  private val swapPriceImpactSql =
    s"""WITH $swapsCte
       |SELECT
       |  '0x' || repeat('e', 39) || printf('%x', user_id % 4) AS pool,
       |  'uniswap_v2' AS protocol,
       |  1 AS chain_id,
       |  ROUND(AVG(CAST(a1out AS DOUBLE) / CAST(a0in AS DOUBLE)), 6) AS avg_price,
       |  ROUND(STDDEV_SAMP(CAST(a1out AS DOUBLE) / CAST(a0in AS DOUBLE)), 6)
       |    AS price_volatility,
       |  CAST(SUM(CAST(a0in AS DECIMAL(38,0))) AS VARCHAR) AS total_volume_token0,
       |  COUNT(*) AS swap_count
       |FROM s GROUP BY 1, 2, 3 HAVING COUNT(*) > 5
       |ORDER BY pool""".stripMargin

  // ----------------------------------------------------------------- model
  /** Returns series for the VaR family: a pure per-row projection of the
    * purchase events (range ≈ [−0.5, 1.4], 5th percentile in the loss
    * tail) — the same expression on both engines, bit-exact. */
  private def returnsDf(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_type") === "purchase")
      .select(col("event_id").as("idx"),
        (col("value") / 300.0 - 0.5).as("r"))

  private val returnsCte =
    """r AS (
      |  SELECT event_id AS idx, value / 300.0 - 0.5 AS r
      |  FROM events WHERE event_type = 'purchase'
      |)""".stripMargin

  /** Exact double literal of Spark's `1 - confidence` (Double.toString
    * round-trips, so DuckDB parses the identical quantile fraction). */
  private def pLit(confidence: Double): String = (1 - confidence).toString

  private val varCompute: Q = (s, dir) => {
    import s.implicits._
    val m = new HistoricalVaR(returnsDf(s, dir), "r", 1000000.0)
    // ROUND(4): Spark interpolates the quantile as (h−pos)·l + (pos−l)·h,
    // DuckDB as l + frac·(h−l) — up to 1 ulp apart, ×1e6 position size ≈
    // 6e-11 USD; a 0.1-cent grid absorbs it on both sides
    m.computeAll(Seq((0.95, 1), (0.99, 1), (0.95, 10)))
      .toDF()
      .withColumn("varUsd", round(col("varUsd"), 4))
      .withColumn("cvarUsd", round(col("cvarUsd"), 4))
      .orderBy("confidence", "horizonDays")
  }

  private val varComputeSql = {
    def leg(conf: Double, tag: String) =
      s"""q$tag AS (SELECT quantile_cont(r, ${pLit(conf)}) AS q FROM r),
         |t$tag AS (
         |  SELECT CAST(CAST(SUM(CAST(r AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(r) AS tm
         |  FROM r, q$tag WHERE r <= q
         |)""".stripMargin
    s"""WITH $returnsCte, n AS (SELECT COUNT(r) AS n FROM r),
       |${leg(0.95, "95")},
       |${leg(0.99, "99")}
       |SELECT * FROM (
       |  SELECT 0.95 AS confidence, CAST(1 AS INTEGER) AS "horizonDays",
       |    ROUND((-q) * 1000000.0, 4) AS "varUsd",
       |    ROUND((-tm) * 1000000.0, 4) AS "cvarUsd",
       |    n AS "returnsUsed", 'historical_simulation' AS method
       |  FROM q95, t95, n
       |  UNION ALL
       |  SELECT 0.99, CAST(1 AS INTEGER), ROUND((-q) * 1000000.0, 4),
       |    ROUND((-tm) * 1000000.0, 4), n, 'historical_simulation'
       |  FROM q99, t99, n
       |  UNION ALL
       |  SELECT 0.95, CAST(10 AS INTEGER), ROUND(((-q) * sqrt(10)) * 1000000.0, 4),
       |    ROUND(((-tm) * sqrt(10)) * 1000000.0, 4), n, 'historical_simulation'
       |  FROM q95, t95, n
       |) ORDER BY confidence, "horizonDays"""".stripMargin
  }

  private val rollingVar: Q = (s, dir) =>
    new HistoricalVaR(returnsDf(s, dir), "r", 1000000.0)
      .rollingVar(window = 30)
      .withColumn("rolling_var", round(col("rolling_var"), 2))
      .orderBy("idx")

  private val rollingVarSql =
    s"""WITH $returnsCte
       |SELECT idx, r,
       |  CASE WHEN COUNT(r) OVER w >= 15
       |    THEN ROUND((quantile_cont(r, ${pLit(0.95)}) OVER w) * (-1000000.0), 2)
       |  END AS rolling_var
       |FROM r
       |WINDOW w AS (ORDER BY idx ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
       |ORDER BY idx""".stripMargin

  private val stressTest: Q = (s, dir) =>
    new HistoricalVaR(returnsDf(s, dir), "r", 1000000.0)
      .stressTest(Seq(-0.10, -0.20, -0.30, -0.50)).orderBy(desc("shock_pct"))

  private val stressTestSql =
    """SELECT shock * 100 AS shock_pct,
      |  shock * 1000000.0 AS pnl_usd,
      |  1000000.0 + shock * 1000000.0 AS position_remaining
      |FROM (VALUES (-0.10), (-0.20), (-0.30), (-0.50)) t(shock)
      |ORDER BY shock_pct DESC""".stripMargin

  private val ilScan: Q = (s, _) =>
    ImpermanentLossModel.scanPriceRange(s, 2000.0, 10000.0,
      (2 to 100).map(r => math.rint(r * 0.05 * 100) / 100))
      .orderBy("price_ratio")

  /** `math.rint(r·0.05·100)` is exactly the integer 5r (error ≪ 0.5), so the
    * grid is `double(5r)/100` — reproduced from range() without rint. */
  private val ilScanSql =
    """WITH g AS (
      |  SELECT CAST(r * 5 AS DOUBLE) / 100 AS price_ratio FROM range(2, 101) t(r)
      |)
      |SELECT price_ratio,
      |  2000.0 * price_ratio AS price_current,
      |  ((2 * sqrt(price_ratio)) / (1 + price_ratio) - 1) * 100 AS il_pct,
      |  10000.0 * ((2 * sqrt(price_ratio)) / (1 + price_ratio)) AS lp_value,
      |  10000.0 * (1 + price_ratio) / 2 AS hold_value,
      |  10000.0 * ((2 * sqrt(price_ratio)) / (1 + price_ratio))
      |    - 10000.0 * (1 + price_ratio) / 2 AS loss_usd
      |FROM g ORDER BY price_ratio""".stripMargin

  private val mevScores: Q = (s, dir) =>
    new MEVExposureModel(transactionsBase(s, dir), Some(swaps(s, dir)))
      .scoreAllBlocks()

  private val mevScoresSql = {
    val sandwich = "LEAST(100.0, COALESCE(hap, 0) * 25.0)"
    val frontrun =
      """CASE WHEN gas_med IS NULL OR gas_med = 0.0 THEN 0.0
        |    ELSE LEAST(100.0, GREATEST(0.0, (gas_max / gas_med - 1) * 20)) END"""
        .stripMargin
    // the median mirrors the engine's rank-based form TERM FOR TERM:
    // quantile_cont interpolates as (1-f)·l + f·h, whose double can differ
    // from the engine's l + (h-l)·0.5 by one ulp (observed: l=24.16,
    // h=78.24 → 51.2 vs 51.199999999999996), and that ulp crossed a
    // ROUND(x, 2) boundary in mev_score at sf0.1 block 19045160
    s"""WITH $txCte, gr AS (
       |  SELECT block_number, gas_price_gwei AS g,
       |    ROW_NUMBER() OVER (PARTITION BY block_number
       |      ORDER BY gas_price_gwei NULLS FIRST) AS rn,
       |    COUNT(gas_price_gwei) OVER (PARTITION BY block_number) AS nn,
       |    COUNT(*) OVER (PARTITION BY block_number) AS nt,
       |    MAX(gas_price_gwei) OVER (PARTITION BY block_number) AS gmax
       |  FROM f
       |), gmid AS (
       |  SELECT block_number, g, gmax FROM gr
       |  WHERE (nn > 0 AND (rn - (nt - nn) = FLOOR((nn + 1) / 2)
       |                  OR rn - (nt - nn) = FLOOR(nn / 2) + 1))
       |     OR (nn = 0 AND rn = 1)
       |), gas AS (
       |  SELECT block_number, MAX(gmax) AS gas_max,
       |    MIN(g) + (MAX(g) - MIN(g)) * 0.5 AS gas_med
       |  FROM gmid GROUP BY 1
       |), sw AS (
       |  SELECT 19000000 + (event_id // 3) * 10 AS block_number,
       |    (user_id % 4) AS pool, COUNT(*) AS c
       |  FROM events WHERE event_type = 'purchase'
       |  GROUP BY 1, 2
       |), sig AS (
       |  SELECT block_number,
       |    SUM(CASE WHEN c >= 3 THEN 1 ELSE 0 END) AS hap,
       |    SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS bp
       |  FROM sw GROUP BY 1
       |), j AS (
       |  SELECT gas.block_number, gas_max, gas_med, hap, bp
       |  FROM gas LEFT JOIN sig ON gas.block_number = sig.block_number
       |)
       |SELECT block_number,
       |  ROUND(LEAST(100.0, $sandwich * 0.5 + ($frontrun) * 0.4
       |    + CAST(COALESCE(bp, 0) AS INTEGER) * 2), 2) AS mev_score,
       |  ROUND($sandwich, 2) AS sandwich_risk,
       |  ROUND($frontrun, 2) AS frontrun_risk,
       |  CAST(COALESCE(bp, 0) AS INTEGER) AS backrun_opportunities
       |FROM j ORDER BY block_number""".stripMargin
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

  val oracleSql: Map[String, String] = Map(
    "etl_decode_transfers"  -> decodeTransfersSql,
    "etl_parse_swaps"       -> parseSwapsSql,
    "etl_tx_features"       -> txFeaturesSql,
    "etl_block_agg"         -> blockAggSql,
    "etl_transfer_volume"   -> transferVolumeSql,
    "etl_swap_price_impact" -> swapPriceImpactSql,
    "model_var_compute"     -> varComputeSql,
    "model_rolling_var"     -> rollingVarSql,
    "model_stress_test"     -> stressTestSql,
    "model_il_scan"         -> ilScanSql,
    "model_mev_scores"      -> mevScoresSql,
  )
}
