package graft.etl

import scala.util.Random
import graft.schema.Envelope

/** Deterministic envelope-JSON fixture builders, ported from the reference's
  * test builders (/root/reference/tests/test_etl_pipeline.py:34-79) and bulk
  * generators (/root/reference/api/data_service.py:25-107). numpy bit streams
  * aren't reproducible in Scala, so the bulk generators preserve structure
  * and distributions (counts, mixes, ranges, spike cadence), not exact draws
  * (SURVEY.md §5.2.4); the hand-built single-message builders are exact.
  */
object Fixtures {
  val Usdc = "0xA0b86991c6218b36c1d19D4a2e9Eb0cE3606eB48"
  val Contracts = Seq(
    Usdc,
    "0xdAC17F958D2ee523a2206206994597C13D831ec7", // USDT
    "0x6B175474E89094C44Da98b954EedeAC495271d0F", // DAI
    "0xC02aaA39b223FE8D0A0e5C4F27eAD9083C756Cc2") // WETH
  val NftContracts = Seq(
    "0xBC4CA0EdA7647A8aB7C2061c2E118A18a936f13D", // BAYC
    "0x60E4d786628Fea6478F785A6d7e704777c86a7c6") // MAYC

  /** Fixed "now" for reproducible fixtures (no wall clock — SURVEY.md §7.3). */
  val FixedNow: Long = 1700000000L

  private def jstr(s: String) = "\"" + s + "\""

  private def envelope(blockNumber: Long, ts: Long, eventType: String,
                       payload: String): String =
    s"""{"chain_id": 1, "network": "ethereum-mainnet",
       | "block_number": $blockNumber, "block_timestamp": $ts,
       | "event_type": ${jstr(eventType)}, "payload": $payload,
       | "ingested_at": $ts.0}""".stripMargin.replaceAll("\n", "")

  /** ERC-20/721 Transfer log message (test_etl_pipeline.py:34-58). */
  def transferMessage(standard: String = "ERC-20",
                      blockNumber: Long = 18000000L,
                      ts: Long = FixedNow,
                      contract: String = Usdc,
                      fromAddr: String = "0x" + "a" * 64,
                      toAddr: String = "0x" + "b" * 64,
                      amount: BigInt = BigInt(10) * BigInt(10).pow(18),
                      logIndex: Long = 0L,
                      tokenId: BigInt = BigInt(1),
                      txHash: String = "0x" + "c" * 64): String = {
    val base = Seq(Envelope.Erc20TransferTopic, fromAddr, toAddr)
    val idHex = tokenId.toString(16)
    val topics =
      if (standard == "ERC-721") base :+ ("0x" + "0" * (64 - idHex.length) + idHex)
      else base
    val data = if (standard == "ERC-721") "0x" else "0x" + amount.toString(16)
    val payload =
      s"""{"tx_hash": ${jstr(txHash)}, "log_index": $logIndex,
         | "contract": ${jstr(contract)},
         | "topics": [${topics.map(jstr).mkString(", ")}],
         | "data": ${jstr(data)}}""".stripMargin.replaceAll("\n", "")
    envelope(blockNumber, ts, "token_transfer", payload)
  }

  /** Transaction message (test_etl_pipeline.py:61-79). */
  def transactionMessage(gasPriceGwei: Double = 50,
                         valueEth: Double = 1.0,
                         blockNumber: Long = 18000000L,
                         ts: Long = FixedNow,
                         nonce: Long = 42L,
                         to: Option[String] = Some("0x" + "b" * 40)): String = {
    val toJson = to.map(jstr).getOrElse("null")
    val payload =
      s"""{"hash": ${jstr("0x" + "d" * 64)}, "from": ${jstr("0x" + "a" * 40)},
         | "to": $toJson, "value_wei": ${jstr((valueEth * 1e18).toLong.toString)},
         | "gas": 21000, "gas_price": ${jstr((gasPriceGwei * 1e9).toLong.toString)},
         | "nonce": $nonce, "input": ${jstr("0xa9059cbb" + "0" * 56)}}"""
        .stripMargin.replaceAll("\n", "")
    envelope(blockNumber, ts, "transaction", payload)
  }

  /** Uniswap V2 Swap log message: data = ABI static layout, 4×32-byte words. */
  def swapMessage(pool: String = "0x" + "e" * 40,
                  amount0In: BigInt = BigInt(0), amount1In: BigInt = BigInt(0),
                  amount0Out: BigInt = BigInt(0), amount1Out: BigInt = BigInt(0),
                  blockNumber: Long = 18000000L,
                  ts: Long = FixedNow,
                  txHash: String = "0x" + "f" * 64): String = {
    def word(v: BigInt): String = { val h = v.toString(16); "0" * (64 - h.length) + h }
    val data = "0x" + Seq(amount0In, amount1In, amount0Out, amount1Out).map(word).mkString
    val payload =
      s"""{"tx_hash": ${jstr(txHash)}, "log_index": 0,
         | "contract": ${jstr(pool)},
         | "topics": [${jstr(Envelope.UniswapV2SwapTopic)}],
         | "data": ${jstr(data)}}""".stripMargin.replaceAll("\n", "")
    envelope(blockNumber, ts, "log", payload)
  }

  /** Bulk synthetic transfers (data_service.py:25-75): n over 24h, 15% NFT
    * mix, contracts from the 4+2 sets, amounts 100–100k tokens ×1e18. */
  def syntheticTransferMessages(n: Int = 200, baseTs: Long = FixedNow - 86400,
                                seed: Int = 42): Seq[String] = {
    val rng = new Random(seed)
    (0 until n).map { i =>
      val hourOffset = (i / (n / 24.0)).toInt
      val ts = baseTs + hourOffset * 3600L + rng.nextInt(3600)
      val isNft = rng.nextDouble() < 0.15
      val contract =
        if (isNft) NftContracts(rng.nextInt(NftContracts.length))
        else Contracts(rng.nextInt(Contracts.length))
      val fromAddr = "0x" + "a" * 63 + Integer.toHexString(rng.nextInt(16))
      val toAddr = "0x" + "b" * 63 + Integer.toHexString(rng.nextInt(16))
      val amount = BigInt(((100 + rng.nextDouble() * 99900) * 1e6).toLong) * BigInt(10).pow(12)
      transferMessage(
        standard = if (isNft) "ERC-721" else "ERC-20",
        blockNumber = 19000000L + i * 10L, ts = ts, contract = contract,
        fromAddr = fromAddr, toAddr = toAddr, amount = amount, logIndex = i.toLong)
    }
  }

  /** Bulk synthetic transactions (data_service.py:78-107): MEV gas spike
    * (200–500 gwei vs 15–80) every 12th message, 3 txs per block. */
  def syntheticTxMessages(n: Int = 120, baseTs: Long = FixedNow,
                          seed: Int = 7): Seq[String] = {
    val rng = new Random(seed)
    (0 until n).map { i =>
      val isMevBlock = i % 12 == 0
      val gasPrice =
        if (isMevBlock) 200 + rng.nextDouble() * 300 else 15 + rng.nextDouble() * 65
      transactionMessage(
        gasPriceGwei = gasPrice,
        valueEth = rng.nextDouble() * 5,
        blockNumber = 19000000L + (i / 3) * 10L,
        ts = baseTs - (n - i) * 12L,
        nonce = i.toLong)
    }
  }
}
