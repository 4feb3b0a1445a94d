package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.etl.{Fixtures, Ingest, TokenTransferDecoder}
import graft.streaming.StreamingEtl

/** Streaming slice driven synchronously with MemoryStream +
  * processAllAvailable — micro-batches exercise the same decode transforms
  * as batch, and the windowed agg matches the batch groupBy on the same
  * data. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming decode + hourly window agg matches batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val out = StreamingEtl.hourlyTransferVolume(
      StreamingEtl.decodeTransfers(stream.toDS()))
    val q = out.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("hourly_out").start()
    try {
      val msgs = Fixtures.syntheticTransferMessages(120)
      stream.addData(msgs.take(60): _*)
      q.processAllAvailable()
      stream.addData(msgs.drop(60): _*)
      q.processAllAvailable()

      val streamed = spark.table("hourly_out")
        .select("hour_bucket", "standard", "transfer_count")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

      val batch = TokenTransferDecoder.decode(Ingest.parseRaw(spark, msgs))
        .groupBy(date_trunc("hour", col("block_timestamp")).as("hour_bucket"),
          col("standard"))
        .agg(count(lit(1)).as("transfer_count"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming exact dedup drops repeated content across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDS().toDF("doc_id", "text")
    val out = StreamingEtl.dedupedByContent(docs)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    try {
      stream.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      stream.addData((4L, "alpha"), (5L, "gamma")) // alpha seen in batch 1
      q.processAllAvailable()
      val texts = spark.table("dedup_out").select("text")
        .collect().map(_.getString(0)).toSeq
      assert(texts.sorted == Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("keyed state accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val out = StreamingEtl.runningContractTotals(
      StreamingEtl.decodeTransfers(stream.toDS()))
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("contract_out").start()
    try {
      // same contract in both batches → state must accumulate to 2 transfers
      stream.addData(Fixtures.transferMessage(blockNumber = 1, logIndex = 0))
      q.processAllAvailable()
      stream.addData(Fixtures.transferMessage(blockNumber = 2, logIndex = 1))
      q.processAllAvailable()
      val rows = spark.table("contract_out")
        .groupBy("contract").agg(max("transfers").as("transfers"))
        .collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Long]("transfers") == 2L)
    } finally q.stop()
  }
}
