package graft.schema

import org.apache.spark.sql.types._

/** The universal wire format: one envelope, variant payload
  * (`BlockchainEvent`, /root/reference/src/ingestion/kafka_producer.py:37-52).
  *
  * The payload is a single wide nullable struct merging the per-event_type
  * shapes (log/token_transfer, transaction, block —
  * kafka_producer.py:161-169,183-194 and etl fixtures). Fields irrelevant to
  * an event_type stay null; Spark's nested-schema pruning keeps scans narrow.
  */
object Envelope {

  val payloadSchema: StructType = StructType(Seq(
    // log / token_transfer events
    StructField("tx_hash", StringType),
    StructField("log_index", LongType),
    StructField("contract", StringType),
    StructField("topics", ArrayType(StringType)),
    StructField("data", StringType),
    // transaction events
    StructField("hash", StringType),
    StructField("from", StringType),
    StructField("to", StringType),          // null ⇒ contract deploy
    StructField("value_wei", StringType),   // stringified uint256
    StructField("gas", LongType),
    StructField("gas_price", StringType),
    StructField("max_fee_per_gas", StringType),
    StructField("max_priority_fee", StringType),
    StructField("nonce", LongType),
    StructField("input", StringType),
    // block events
    StructField("parent_hash", StringType),
    StructField("miner", StringType),
    StructField("gas_used", LongType),
    StructField("gas_limit", LongType),
    StructField("base_fee_per_gas", LongType),
    StructField("tx_count", LongType),
  ))

  val schema: StructType = StructType(Seq(
    StructField("chain_id", IntegerType),
    StructField("network", StringType),
    StructField("block_number", LongType),
    StructField("block_timestamp", LongType), // unix seconds
    StructField("event_type", StringType),    // block|transaction|log|token_transfer
    StructField("payload", payloadSchema),
    StructField("ingested_at", DoubleType),
  ))

  /** keccak256("Transfer(address,address,uint256)") — the standard ERC-20/721
    * Transfer topic (value fixed by the Ethereum standard;
    * etl_pipeline.py:38 computes it at import time). */
  val Erc20TransferTopic =
    "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"

  /** keccak256("Swap(address,uint256,uint256,uint256,uint256,address)") —
    * Uniswap V2 Swap topic (etl_pipeline.py:30-32). */
  val UniswapV2SwapTopic =
    "0xd78ad95fa46c994b6551d0da85fc275fe613ce37657fb8d5e3d130840159d822"

  /** keccak256("Swap(address,address,int256,int256,uint160,uint128,int24)") —
    * Uniswap V3 Swap topic (etl_pipeline.py:34-36; recognized, not parsed
    * by the reference either). */
  val UniswapV3SwapTopic =
    "0xc42079f94a6350d7e6235f29174924f928cc2ac818eb64fed8004e115fbcca67"

  /** Known DeFi function selectors → names (etl_pipeline.py:41-47). */
  val TokenStandards: Map[String, String] = Map(
    "0xa9059cbb" -> "ERC20.transfer",
    "0x23b872dd" -> "ERC20.transferFrom",
    "0x095ea7b3" -> "ERC20.approve",
    "0x42842e0e" -> "ERC721.safeTransferFrom",
    "0xf242432a" -> "ERC1155.safeTransferFrom",
  )
}

/** Decoded token transfer row (etl_pipeline.py:85-129). `amount` is double to
  * mirror the reference's float64 cast; `amount_raw` keeps the exact uint256
  * as DECIMAL(38,0) — an engine improvement the reference cannot offer. */
case class TokenTransfer(
  standard: String, contract: String, from: String, to: String,
  token_id: Option[java.math.BigDecimal], amount: Double,
  amount_raw: java.math.BigDecimal,
  block_number: Long, block_timestamp: java.sql.Timestamp,
  tx_hash: String, chain_id: Int)

/** Parsed Uniswap V2 swap row (etl_pipeline.py:152-160). */
case class Swap(
  protocol: String, pool: String,
  amount0_in: java.math.BigDecimal, amount1_in: java.math.BigDecimal,
  amount0_out: java.math.BigDecimal, amount1_out: java.math.BigDecimal,
  price: Double, block_number: Long, block_timestamp: java.sql.Timestamp,
  chain_id: Int, tx_hash: String)

/** Result rows for the risk models (risk_models.py:28-51). */
case class VaRResult(confidence: Double, horizonDays: Int, varUsd: Double,
  cvarUsd: Double, returnsUsed: Long, method: String)

case class ImpermanentLossResult(priceRatio: Double, ilPct: Double,
  holdValue: Double, lpValue: Double, lossUsd: Double)

case class MEVRiskResult(blockNumber: Long, mevScore: Double,
  sandwichRisk: Double, frontrunRisk: Double, backrunOpportunities: Int)
