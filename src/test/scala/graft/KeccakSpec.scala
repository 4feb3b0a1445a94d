package graft

import org.apache.spark.sql.functions._
import graft.functions.{Keccak256, KeccakFunctions}
import graft.schema.Envelope

/** Keccak-256 against the standard's published vectors, and EIP-55 against
  * the vectors in the EIP itself. */
class KeccakSpec extends SparkSpec {
  import spark.implicits._

  test("keccak256 known vectors") {
    assert(Keccak256.hashHex("") ==
      "0xc5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(Keccak256.hashHex("abc") ==
      "0x4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    // the event-topic constants in graft.schema.Envelope are derived hashes
    assert(Keccak256.hashHex("Transfer(address,address,uint256)") ==
      Envelope.Erc20TransferTopic)
    assert(Keccak256.hashHex("Swap(address,uint256,uint256,uint256,uint256,address)") ==
      Envelope.UniswapV2SwapTopic)
    assert(Keccak256.hashHex("Swap(address,address,int256,int256,uint160,uint128,int24)") ==
      Envelope.UniswapV3SwapTopic)
  }

  test("keccak256 multi-block input (> 136-byte rate)") {
    val long = "a" * 300
    // reference value computed with the same public algorithm elsewhere —
    // assert structural properties + determinism across the codegen path
    val viaScala = Keccak256.hashHex(long)
    KeccakFunctions.register(spark)
    val viaSpark = Seq(long).toDF("s")
      .select(KeccakFunctions.keccak256(col("s"))).collect()(0).getString(0)
    assert(viaScala == viaSpark)
    assert(viaScala.length == 66 && viaScala.startsWith("0x"))
  }

  test("EIP-55 checksum vectors from the EIP") {
    val vectors = Seq(
      "0x5aaeb6053f3e94c9b9a09f33669435e7ef1beaed" ->
        "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed",
      "0xfb6916095ca1df60bb79ce92ce3ea74c37c5d359" ->
        "0xfB6916095ca1df60bB79Ce92cE3Ea74c37c5d359",
      "0xdbf03b407c01e7cd3cbea99509d93f8dddc8c6fb" ->
        "0xdbF03B407c01E7cD3CBea99509d93f8DDDC8C6FB",
      "0xd1220a0cf47c7b9be7a2e6ba89f429762e7b9adb" ->
        "0xD1220A0cf47c7B9Be7A2E6BA89F429762e7b9aDb")
    vectors.foreach { case (lower, expected) =>
      assert(Keccak256.toChecksumAddress(lower) == expected)
      // idempotent on already-checksummed input
      assert(Keccak256.toChecksumAddress(expected) == expected)
    }
  }

  test("GraftExtensions injects the custom function set") {
    // the builder-time path can't be exercised on the shared session; the
    // injection list itself must at least build without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
  }

  test("checksum_address as a column expression") {
    KeccakFunctions.register(spark)
    val got = Seq("0x5aaeb6053f3e94c9b9a09f33669435e7ef1beaed").toDF("a")
      .select(KeccakFunctions.checksumAddress(col("a"))).collect()(0).getString(0)
    assert(got == "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed")
  }
}
