package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.schema.Envelope

/** Deterministic envelope feed derived from a warehouse table.
  *
  * The driver's `events` parquet plays the role of an upstream warehouse
  * table being replayed into the engine as RPC-envelope JSON — the batch
  * counterpart of the reference's poll-loop feeder
  * (/root/reference/src/ingestion/kafka_producer.py:129-148), and the form
  * a 100 TB backfill actually takes: read a partitioned table, project each
  * row into the wire envelope, stream through the SAME parse/decode path as
  * live traffic. Every derived field below is a pure column expression of
  * the source row (IEEE double products, truncating casts, md5, hex), so
  * the decoded output is reproducible by any engine that reads the same
  * table — which is exactly what makes the etl_ and model_ contract queries
  * DuckDB-oracle-checkable (the twin recomputes the decode arithmetic
  * directly from `events`, never seeing the JSON).
  *
  * Scale posture: one narrow projection + to_json per row, no shuffle, no
  * UDFs — the feed stays inside whole-stage codegen and partitions with the
  * source table.
  */
object EventEnvelopes {

  /** Shared "now" for the derived feeds: every block_timestamp is an offset
    * below this fixed epoch second, so time-windowed queries over the feed
    * are reproducible (no wall clock anywhere in a plan). */
  val NowSec = 1700000000L

  private def hexDigit(c: Column): Column = lower(hex(c))

  /** Floor division of a small non-negative long column (exact in double,
    * truncating cast = floor for non-negatives — the oracle's `a // b`). */
  private def floorDiv(c: Column, d: Long): Column = (c / d).cast("long")

  /** '0x' + 64-hex-char word (big-endian, zero-padded) of a long column. */
  private def word64(c: Column): Column = lpad(lower(hex(c)), 64, "0")

  private def envelopeJson(eventType: String, bn: Column, tsSec: Column,
                           payload: Column): Column =
    to_json(struct(
      lit(1).as("chain_id"),
      lit("ethereum-mainnet").as("network"),
      bn.as("block_number"),
      tsSec.as("block_timestamp"),
      lit(eventType).as("event_type"),
      payload.as("payload"),
      tsSec.cast("double").as("ingested_at")))

  /** ERC-20/721 Transfer envelopes, one per events row.
    *
    * Field derivations (the DuckDB twin recomputes these verbatim):
    *  - ERC-721 iff event_type = 'signup' (~20% NFT mix, like the
    *    reference's 15% — data_service.py:37)
    *  - block_number = 19000000 + (event_id div 5) * 10  (5 logs/block)
    *  - ts = NowSec - (event_id * 37 mod 86400)  (spread over 24 h, max at
    *    event_id 0 so the transfer-volume :now boundary keeps all rows)
    *  - contract from the 4 ERC-20 / 2 NFT fixture sets by user_id
    *  - from/to = 'a'*39/'b'*39 + one hex digit of user_id (16 senders ×
    *    16 receivers — small enough to embed their EIP-55 forms as oracle
    *    literals, like the ANN plane matrix)
    *  - amount_wei = trunc(value * 1e15)  (exact IEEE product both engines)
    */
  def transferEnvelopes(events: DataFrame): Dataset[String] = {
    import events.sparkSession.implicits._
    val isNft = col("event_type") === "signup"
    val bn = lit(19000000L) + floorDiv(col("event_id"), 5) * 10
    val tsSec = lit(NowSec) - pmod(col("event_id") * 37, lit(86400))
    val amountWei = (col("value") * lit(1e15)).cast("long")
    val contract = when(isNft,
        element_at(typedlit(Fixtures.NftContracts),
          (pmod(col("user_id"), lit(2)) + 1).cast("int")))
      .otherwise(
        element_at(typedlit(Fixtures.Contracts),
          (pmod(col("user_id"), lit(4)) + 1).cast("int")))
    val fromTopic = concat(lit("0x" + "0" * 24 + "a" * 39),
      hexDigit(pmod(col("user_id"), lit(16))))
    val toTopic = concat(lit("0x" + "0" * 24 + "b" * 39),
      hexDigit(pmod(floorDiv(col("user_id"), 16), lit(16))))
    val t1 = lit(Envelope.Erc20TransferTopic)
    val topics = when(isNft,
        array(t1, fromTopic, toTopic, concat(lit("0x"), word64(col("event_id")))))
      .otherwise(array(t1, fromTopic, toTopic))
    val data = when(isNft, lit("0x"))
      .otherwise(concat(lit("0x"), lower(hex(amountWei))))
    val payload = struct(
      concat(lit("0x"), md5(concat(lit("tx"), col("event_id").cast("string"))))
        .as("tx_hash"),
      col("event_id").as("log_index"),
      contract.as("contract"),
      topics.as("topics"),
      data.as("data"))
    events.select(
        envelopeJson("token_transfer", bn, tsSec, payload).as("value"))
      .as[String]
  }

  /** Uniswap V2 Swap envelopes from 'purchase' events.
    *  - pool = '0x' + 'e'*39 + hex(user_id mod 4)  (4 pools)
    *  - block_number = 19000000 + (event_id div 3) * 10
    *  - ts = NowSec - (event_id mod 3000)  (all inside the price-impact
    *    query's 1-hour window)
    *  - amount0_in = trunc(value*1e15) + 1,
    *    amount1_out = trunc(value*(2e15 + (user_id mod 150)*1e13)) + 1
    *    (nonzero, so price = amount1_out/amount0_in on every row, spread
    *    over [2.0, 3.5) by user so per-pool price volatility is a real
    *    statistic; the mod keeps the product inside the wei word for ANY
    *    user-id magnitude — a raw warehouse id in the 1e8+ range would
    *    otherwise overflow the truncating long cast, found by the sf1
    *    replicated-fixture run)
    */
  def swapEnvelopes(events: DataFrame): Dataset[String] = {
    import events.sparkSession.implicits._
    val bn = lit(19000000L) + floorDiv(col("event_id"), 3) * 10
    val tsSec = lit(NowSec) - pmod(col("event_id"), lit(3000))
    val a0in = (col("value") * lit(1e15)).cast("long") + 1
    val a1out = (col("value") *
        (lit(2.0e15) + pmod(col("user_id"), lit(150)) * lit(1e13)))
      .cast("long") + 1
    val data = concat(lit("0x"), word64(a0in), lit("0" * 128), word64(a1out))
    val payload = struct(
      concat(lit("0x"), md5(concat(lit("sw"), col("event_id").cast("string"))))
        .as("tx_hash"),
      lit(0L).as("log_index"),
      concat(lit("0x" + "e" * 39), hexDigit(pmod(col("user_id"), lit(4))))
        .as("contract"),
      array(lit(Envelope.UniswapV2SwapTopic)).as("topics"),
      data.as("data"))
    events.filter(col("event_type") === "purchase")
      .select(envelopeJson("log", bn, tsSec, payload).as("value"))
      .as[String]
  }

  /** Transaction envelopes from 'click'/'view' events.
    *  - block_number = 19000000 + (event_id div 5) * 10
    *  - gas_price = 15e9 + trunc(value * 1e9)  (15–575 gwei)
    *  - value_wei = trunc(value * 1e16)
    *  - contract deploy (null `to`) iff user_id mod 20 = 0
    *  - fn selector cycles {transfer, approve, unknown} by user_id mod 3
    */
  def txEnvelopes(events: DataFrame): Dataset[String] = {
    import events.sparkSession.implicits._
    val bn = lit(19000000L) + floorDiv(col("event_id"), 5) * 10
    val tsSec = lit(NowSec) - pmod(col("event_id") * 13, lit(86400))
    val gasPrice = (lit(15000000000L) + (col("value") * lit(1e9)).cast("long"))
      .cast("string")
    val valueWei = (col("value") * lit(1e16)).cast("long").cast("string")
    val to = when(pmod(col("user_id"), lit(20)) === 0, lit(null).cast("string"))
      .otherwise(lit("0x" + "b" * 40))
    val input = concat(
      element_at(typedlit(Seq("0xa9059cbb", "0x095ea7b3", "0xdeadbeef")),
        (pmod(col("user_id"), lit(3)) + 1).cast("int")),
      lit("0" * 56))
    val payload = struct(
      concat(lit("0x"), md5(concat(lit("txn"), col("event_id").cast("string"))))
        .as("hash"),
      lit("0x" + "a" * 40).as("from"),
      to.as("to"),
      valueWei.as("value_wei"),
      lit(21000L).as("gas"),
      gasPrice.as("gas_price"),
      col("event_id").as("nonce"),
      input.as("input"))
    events.filter(col("event_type").isin("click", "view"))
      .select(envelopeJson("transaction", bn, tsSec, payload).as("value"))
      .as[String]
  }
}
