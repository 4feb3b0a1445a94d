package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.etl.{Fixtures, Ingest, TokenTransferDecoder}
import graft.streaming.{EmbeddedTopicLog, KafkaIO, StreamingEtl}

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

  test("exact streaming distinct counts match the batch twin after flush") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val out = StreamingEtl.hourlyTransferVolumeExact(
      StreamingEtl.decodeTransfers(stream.toDS()), watermark = "10 minutes")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("hourly_exact_out").start()
    try {
      val msgs = Fixtures.syntheticTransferMessages(120)
      val batch = TokenTransferDecoder.decode(Ingest.parseRaw(spark, msgs))
      val maxTs = batch.agg(max(col("block_timestamp"))).collect()(0)
        .getTimestamp(0)
      stream.addData(msgs: _*)
      q.processAllAvailable()
      // two flush batches push the watermark past every real window (the
      // watermark advances between micro-batches, and append-mode rows only
      // emit once the watermark passes their window end)
      val flush1 = Fixtures.transferMessage(
        ts = maxTs.toInstant.getEpochSecond + 4 * 3600, blockNumber = 99000001L)
      stream.addData(flush1)
      q.processAllAvailable()
      val flush2 = Fixtures.transferMessage(
        ts = maxTs.toInstant.getEpochSecond + 8 * 3600, blockNumber = 99000002L)
      stream.addData(flush2)
      q.processAllAvailable()

      val streamed = spark.table("hourly_exact_out")
        .filter(col("hour_bucket") <= maxTs)
        .select("hour_bucket", "standard", "transfer_count",
          "unique_senders", "unique_receivers")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet

      val expected = batch
        .groupBy(date_trunc("hour", col("block_timestamp")).as("hour_bucket"),
          col("standard"))
        .agg(count(lit(1)).as("transfer_count"),
          countDistinct(col("from")).as("unique_senders"),
          countDistinct(col("to")).as("unique_receivers"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet

      assert(streamed == expected)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming swap price impact matches batch, including the HAVING cut") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val out = StreamingEtl.hourlySwapPriceImpact(
      StreamingEtl.parseSwaps(stream.toDS()), watermark = "10 minutes")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("swap_impact_out").start()
    try {
      // two pools × two hours with deliberate counts around the HAVING
      // threshold: (A, h0)=8 and (B, h0)=6 pass COUNT(*) > 5; (A, h1)=3
      // and (B, h1)=2 must be cut on BOTH engines
      val base = 1700000000L - (1700000000L % 3600)
      val poolA = "0x" + "a" * 40
      val poolB = "0x" + "b" * 40
      def swaps(pool: String, hour: Int, n: Int): Seq[String] =
        (0 until n).map { i =>
          Fixtures.swapMessage(pool = pool,
            amount0In = BigInt(1000000) + i * 7919, // price varies in-group
            amount1Out = BigInt(2500000) + i * 104729,
            blockNumber = 18000000L + hour * 1000L + i,
            ts = base + hour * 3600L + i * 60L)
        }
      val msgs = swaps(poolA, 0, 8) ++ swaps(poolB, 0, 6) ++
        swaps(poolA, 1, 3) ++ swaps(poolB, 1, 2)
      val maxTs = new java.sql.Timestamp((base + 1 * 3600L + 2 * 60L) * 1000L)
      stream.addData(msgs: _*)
      q.processAllAvailable()
      // advance the watermark past every real window (append-mode rows
      // emit only once the watermark passes their window end)
      stream.addData(Fixtures.swapMessage(amount0In = BigInt(1),
        amount1Out = BigInt(1), blockNumber = 99000001L, ts = base + 4 * 3600))
      q.processAllAvailable()
      stream.addData(Fixtures.swapMessage(amount0In = BigInt(1),
        amount1Out = BigInt(1), blockNumber = 99000002L, ts = base + 8 * 3600))
      q.processAllAvailable()

      def shape(df: org.apache.spark.sql.DataFrame) = df
        .select(col("hour_bucket"), col("pool"), col("swap_count"),
          // stddev/avg partial-buffer merge order differs between the
          // incremental and batch plans — last-ulp only; 6dp pins it
          round(col("avg_price"), 6).as("avg_price"),
          round(col("price_volatility"), 6).as("price_volatility"),
          col("total_volume_token0").cast("string").as("vol"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getString(5))).toSet

      val streamed = shape(spark.table("swap_impact_out")
        .filter(col("hour_bucket") <= maxTs))

      val batchSwaps = graft.etl.DeFiSwapParser.parse(
        Ingest.parseRaw(spark, msgs))
      val expected = shape(batchSwaps
        .groupBy(date_trunc("hour", col("block_timestamp")).as("hour_bucket"),
          col("pool"), col("protocol"), col("chain_id"))
        .agg(avg(col("price")).as("avg_price"),
          stddev_samp(col("price")).as("price_volatility"),
          sum(col("amount0_in") + col("amount0_out")).as("total_volume_token0"),
          count(lit(1)).as("swap_count"))
        .filter(col("swap_count") > 5))

      assert(streamed == expected)
      assert(streamed.size == 2, s"HAVING must keep exactly (A,h0) and (B,h0): $streamed")
      assert(streamed.forall(_._3 > 5))
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

  test("bounded dedup drops dupes inside the watermark, re-emits after expiry") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = stream.toDS().toDF("doc_id", "ts", "text")
    val out = StreamingEtl.dedupedByContentBounded(docs, "ts", "10 seconds")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("bounded_dedup_out").start()
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    try {
      // duplicate within the 10 s delay → dropped
      stream.addData((1L, ts(0), "alpha"), (2L, ts(5), "alpha"))
      q.processAllAvailable()
      // advance the watermark far past alpha's expiry (state evicted)
      stream.addData((3L, ts(600), "flush"))
      q.processAllAvailable()
      // late re-occurrence after expiry → emitted AGAIN (bounded-state trade)
      stream.addData((4L, ts(601), "alpha"))
      q.processAllAvailable()
      val texts = spark.table("bounded_dedup_out").select("text")
        .collect().map(_.getString(0)).toSeq.sorted
      assert(texts == Seq("alpha", "alpha", "flush"),
        s"got $texts: want alpha once per watermark era, not globally unique")
    } finally q.stop()
  }

  test("stream-stream join: swaps enriched by same-tx transfers in the lag") {
    implicit val sqlCtx = spark.sqlContext
    val swapStream = MemoryStream[String]
    val transferStream = MemoryStream[String]
    val out = StreamingEtl.swapsWithFundingTransfer(
      StreamingEtl.parseSwaps(swapStream.toDS()),
      StreamingEtl.decodeTransfers(transferStream.toDS()),
      lag = "10 minutes", watermark = "10 minutes")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ss_join_out").start()
    val t0 = Fixtures.FixedNow
    def tx(i: Int) = "0x" + i.toString * 64
    try {
      // swap at t0 funded by a transfer 60 s earlier — joins;
      // same-tx transfer 11 min earlier — outside the lag, must NOT join;
      // different-tx transfer at the right time — must NOT join
      transferStream.addData(
        Fixtures.transferMessage(ts = t0 - 60, txHash = tx(1), logIndex = 1),
        Fixtures.transferMessage(ts = t0 - 660, txHash = tx(1), logIndex = 2),
        Fixtures.transferMessage(ts = t0 - 60, txHash = tx(2), logIndex = 3))
      swapStream.addData(Fixtures.swapMessage(
        amount0In = BigInt(10).pow(18), amount1Out = BigInt(2) * BigInt(10).pow(18),
        ts = t0, txHash = tx(1)))
      q.processAllAvailable()
      val rows = spark.table("ss_join_out")
        .select("tx_hash", "pool", "token", "amount").collect()
      assert(rows.length == 1, rows.toSeq)
      assert(rows(0).getString(0) == tx(1))
      // both buffers are watermark-bounded: a second round still joins
      transferStream.addData(
        Fixtures.transferMessage(ts = t0 + 540, txHash = tx(3), logIndex = 4))
      swapStream.addData(Fixtures.swapMessage(
        amount0In = BigInt(10).pow(18), ts = t0 + 600, txHash = tx(3)))
      q.processAllAvailable()
      assert(spark.table("ss_join_out").count() == 2)
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched swaps after expiry") {
    implicit val sqlCtx = spark.sqlContext
    val swapStream = MemoryStream[String]
    val transferStream = MemoryStream[String]
    val out = StreamingEtl.swapsWithFundingTransfer(
      StreamingEtl.parseSwaps(swapStream.toDS()),
      StreamingEtl.decodeTransfers(transferStream.toDS()),
      lag = "10 minutes", watermark = "10 minutes",
      joinType = "left_outer")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ss_louter_out").start()
    val t0 = Fixtures.FixedNow
    def tx(i: Int) = "0x" + i.toString * 64
    try {
      // one funded swap, one orphan swap with no transfer anywhere
      transferStream.addData(
        Fixtures.transferMessage(ts = t0 - 60, txHash = tx(1), logIndex = 1))
      swapStream.addData(
        Fixtures.swapMessage(amount0In = BigInt(10).pow(18),
          ts = t0, txHash = tx(1)),
        Fixtures.swapMessage(amount0In = BigInt(10).pow(18),
          ts = t0, txHash = tx(2)))
      q.processAllAvailable()
      // matched row emits immediately; the orphan must wait until the
      // watermark proves no matching transfer can still arrive
      val eager = spark.table("ss_louter_out")
        .collect().map(r => r.getAs[String]("tx_hash")).toSet
      assert(eager == Set(tx(1)), eager)
      // advance BOTH watermarks far past t0 (two rounds: watermark
      // updates between micro-batches)
      for (k <- 1 to 2) {
        transferStream.addData(Fixtures.transferMessage(
          ts = t0 + 100000L * k, txHash = tx(8), logIndex = 10 + k))
        swapStream.addData(Fixtures.swapMessage(
          amount0In = BigInt(10).pow(18), ts = t0 + 100000L * k,
          txHash = tx(9)))
        q.processAllAvailable()
      }
      val rows = spark.table("ss_louter_out")
        .select("tx_hash", "token").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      assert(rows(tx(1)).isDefined)            // joined -> transfer columns
      assert(rows.contains(tx(2)) && rows(tx(2)).isEmpty,
        s"orphan swap not emitted with nulls: $rows") // expired -> nulls
    } finally q.stop()
  }

  test("streaming session windows match the batch session_window after flush") {
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val out = StreamingEtl.sessionWindows(
      stream.toDS().toDF("user_id", "ts"),
      gap = "30 minutes", watermark = "10 minutes")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions_out").start()
    val data = Seq(
      (1L, ts(0)), (1L, ts(600)),  // within gap -> one session
      (1L, ts(3000)),              // 2400 s after -> new session
      (2L, ts(100)))
    try {
      stream.addData(data: _*)
      q.processAllAvailable()
      // sessions emit append-mode only once the watermark passes their
      // end; two far-future flush events advance it across micro-batches
      stream.addData((99L, ts(100000)))
      q.processAllAvailable()
      stream.addData((99L, ts(200000)))
      q.processAllAvailable()
      val streamed = spark.table("sessions_out")
        .filter(col("user_id") =!= 99L)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getTimestamp(2), r.getLong(3))).toSet
      // identical transform in batch mode is the semantic oracle
      val batch = StreamingEtl.sessionWindows(data.toDF("user_id", "ts"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getTimestamp(2), r.getLong(3))).toSet
      assert(streamed == batch)
      assert(streamed.size == 3)
      // session bounds: [first event, last event + gap)
      val s1 = streamed.find(s => s._1 == 1L && s._2 == ts(0)).get
      assert(s1._3 == ts(600 + 1800) && s1._4 == 2L)
    } finally q.stop()
  }

  test("upsert sink keeps the newest row per key across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val stream = MemoryStream[(Long, Long, String)]
    val q = graft.streaming.UpsertSink.start(
      stream.toDS().toDF("k", "ver", "payload"),
      s"$dir/state", s"$dir/ckpt", key = "k", tsCol = "ver")
    try {
      stream.addData((1L, 1L, "a1"), (2L, 1L, "b1"))
      q.processAllAvailable()
      // newer version for k=1, stale (older) arrival for k=2, new key 3
      stream.addData((1L, 5L, "a5"), (2L, 0L, "b0"), (3L, 1L, "c1"))
      q.processAllAvailable()
      val state = spark.read.parquet(s"$dir/state")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
        .toMap
      assert(state == Map(1L -> (5L, "a5"), 2L -> (1L, "b1"),
        3L -> (1L, "c1")), state)
    } finally q.stop()
  }

  test("streaming incremental dedup: corpus twins flagged, stream twins dropped") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val digests = StreamingEtl.corpusDigests(corpus)
    val stream = MemoryStream[(Long, String)]
    val out = StreamingEtl.incrementalDedupStream(
      stream.toDS().toDF("doc_id", "text"), digests)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("inc_dedup_out").start()
    try {
      stream.addData(
        (10L, "alpha beta gamma"),   // corpus duplicate of 1
        (11L, "totally new content"))
      q.processAllAvailable()
      // a later in-stream twin of 11 and another corpus dup
      stream.addData(
        (12L, "totally new content"), // stream twin -> dropped by state
        (13L, "delta epsilon zeta"))  // corpus duplicate of 2
      q.processAllAvailable()
      val rows = spark.table("inc_dedup_out")
        .collect().map(r => r.getLong(0) ->
          (Option(r.get(2)).map(_.asInstanceOf[Long]), r.getString(3))).toMap
      assert(rows == Map(
        10L -> (Some(1L), "corpus_dup"),
        11L -> (None, "keep"),
        13L -> (Some(2L), "corpus_dup")), rows) // 12 never emitted
    } finally q.stop()
  }

  test("end-to-end ingest dedup: index-probed flags survive a mid-stream restart") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    // the batch side materializes the corpus index once
    graft.dedup.IncrementalIndex.write(corpus, s"$dir/idx")
    val stream = MemoryStream[(Long, String)]
    def start() = graft.streaming.IngestDedup.start(
      stream.toDS().toDF("doc_id", "text"),
      s"$dir/idx", s"$dir/state", s"$dir/ckpt", threshold = 0.5)
    val all = Seq(
      10L -> "alpha beta gamma delta epsilon zeta eta theta", // corpus exact dup
      11L -> "totally new content words here now",            // keep
      12L -> "totally new content words here now",            // stream twin of 11
      13L -> "one two three four five six seven eight nine",  // corpus NEAR dup
      14L -> "one two three four five six seven eight",       // corpus exact dup
      15L -> "totally new content words here now",            // stream twin of 11
      16L -> "fresh unique wording entirely different tokens") // keep
    val q1 = start()
    stream.addData(all.take(2): _*)
    q1.processAllAvailable()
    stream.addData(all.slice(2, 4): _*)
    q1.processAllAvailable()
    q1.stop() // crash/deploy boundary: offsets live in the checkpoint
    val q2 = start()
    try {
      stream.addData(all.drop(4): _*)
      q2.processAllAvailable()
      val got = spark.read.parquet(s"$dir/state/flags")
        .collect().map(r => r.getLong(0) -> ((
          Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getString(4)))).toMap
      // spot semantics: both layers of the corpus probe plus the stream layer
      assert(got(10L)._4 == "exact_dup" && got(10L)._1 == Some(1L))
      assert(got(13L)._4 == "near_dup" && got(13L)._2 == Some(2L))
      assert(got(14L)._4 == "exact_dup" && got(14L)._1 == Some(2L))
      assert(got(12L)._4 == "stream_dup" && got(12L)._3 == Some(11L))
      assert(got(15L)._4 == "stream_dup" && got(15L)._3 == Some(11L))
      assert(got(11L)._4 == "keep" && got(16L)._4 == "keep")
      // and the whole table equals the one-shot batch twin on the same data
      val twin = graft.streaming.IngestDedup.batchTwin(
          corpus, all.toDF("doc_id", "text"), 0.5)
        .collect().map(r => r.getLong(0) -> ((
          Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getString(4)))).toMap
      assert(got == twin, s"stream flags != batch twin\n$got\n$twin")
      spark.catalog.clearCache()
    } finally q2.stop()
  }

  test("end-to-end ingest curation: verdicts survive a mid-stream restart") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_icur").toString
    def good(prefix: String) =
      (1 to 70).map(i => s"$prefix$i").mkString(" ") +
        " the and of to in is a " + (71 to 85).map(i => s"$prefix$i").mkString(" ")
    val corpus = Seq((1L, good("c")), (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    graft.streaming.IngestCuration.writeIndex(corpus, s"$dir/idx")
    val stream = MemoryStream[(Long, String)]
    def start() = graft.streaming.IngestCuration.start(
      stream.toDS().toDF("doc_id", "text"),
      s"$dir/idx", s"$dir/state", s"$dir/ckpt")
    val all = Seq(
      10L -> good("c"),               // corpus exact dup
      11L -> good("n"),               // fresh, high quality -> keep
      12L -> good("n"),               // stream exact dup of 11
      13L -> (good("c") + " tailtok"),// corpus near-copy -> boilerplate
      14L -> (good("n") + " tailtok"),// near-copy of 11 ACROSS the restart
      15L -> "a b c",                 // too_short
      16L -> (1 to 20).map(i => s"q$i").mkString(" "), // low_quality
      17L -> good("z"))               // fresh -> keep
    val q1 = start()
    stream.addData(all.take(2): _*)
    q1.processAllAvailable()
    stream.addData(all.slice(2, 4): _*)
    q1.processAllAvailable()
    q1.stop() // crash/deploy boundary: offsets live in the checkpoint
    val q2 = start()
    try {
      stream.addData(all.drop(4): _*)
      q2.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = r.getLong(0) -> ((
        r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getString(4)))
      val got = spark.read.parquet(s"$dir/state/flags").collect().map(key).toMap
      // spot semantics, incl. the cross-restart novelty probe: doc 14's
      // boilerplate verdict requires doc 11's windows from the PRE-restart
      // stream_wins table
      assert(got(10L)._3 == "exact_dup" && got(12L)._3 == "exact_dup")
      assert(got(13L)._3 == "boilerplate" && got(14L)._3 == "boilerplate")
      assert(got(15L)._3 == "too_short" && got(16L)._3 == "low_quality")
      assert(got(11L)._3 == "keep" && got(17L)._3 == "keep")
      // the whole table equals the one-shot batch twin on the same data
      val twin = graft.streaming.IngestCuration.batchTwin(
          corpus, all.toDF("doc_id", "text")).collect().map(key).toMap
      assert(got == twin, s"stream flags != batch twin\n$got\n$twin")
    } finally q2.stop()
  }

  test("ingest curation rejects an out-of-order batch loudly") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_icur_ooo").toString
    graft.streaming.IngestCuration.writeIndex(
      Seq((1L, "one two three four five six seven eight nine ten"))
        .toDF("doc_id", "text"), s"$dir/idx")
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.IngestCuration.start(
      stream.toDS().toDF("doc_id", "text"),
      s"$dir/idx", s"$dir/state", s"$dir/ckpt")
    try {
      stream.addData(20L -> ((1 to 90).map(i => s"a$i").mkString(" ")
        + " the and of to in is a"))
      q.processAllAvailable()
      // doc_id 5 was never flagged and is <= max seen (20): a genuinely
      // out-of-order source. The first-copy-wins guards would silently
      // diverge from batchTwin, so the batch must FAIL, not process.
      stream.addData(5L -> ((1 to 90).map(i => s"b$i").mkString(" ")
        + " the and of to in is a"))
      val e = intercept[Exception] { q.processAllAvailable() }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(_.contains("monotone")), chain(e).mkString("\n"))
      // crash-replay of an ALREADY-FLAGGED batch stays allowed (its ids
      // anti-join away before the guard) — proven by the restart test above
    } finally q.stop()
  }

  test("upsert sink recovers prior state from a crash mid-swap") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_rec").toString
    val statePath = s"$dir/state"
    val stream1 = MemoryStream[(Long, Long, String)]
    val q1 = graft.streaming.UpsertSink.start(
      stream1.toDS().toDF("k", "ver", "payload"),
      statePath, s"$dir/ckpt1", key = "k", tsCol = "ver")
    try {
      stream1.addData((1L, 1L, "a1"), (2L, 1L, "b1"))
      q1.processAllAvailable()
    } finally q1.stop()
    // Simulate a crash between the swap's two renames: the live table was
    // renamed aside and the process died before the stage rename — the
    // only copy of the prior state sits in `__old`, no `state` dir exists.
    val target = new org.apache.hadoop.fs.Path(statePath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(target, new org.apache.hadoop.fs.Path(statePath + "__old")))
    assert(!fs.exists(target))
    // The next micro-batch (a retry, in real life) must restore and merge
    // into the FULL prior state, not rebuild from the batch alone.
    val stream2 = MemoryStream[(Long, Long, String)]
    val q2 = graft.streaming.UpsertSink.start(
      stream2.toDS().toDF("k", "ver", "payload"),
      statePath, s"$dir/ckpt2", key = "k", tsCol = "ver")
    try {
      stream2.addData((3L, 1L, "c1"))
      q2.processAllAvailable()
      val state = spark.read.parquet(statePath)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
        .toMap
      assert(state == Map(1L -> (1L, "a1"), 2L -> (1L, "b1"),
        3L -> (1L, "c1")), state)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(statePath + "__old")))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(statePath + "__stage")))
    } finally q2.stop()
  }

  test("stream-static broadcast enrichment joins without shuffling the stream") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("0xaaa", "USDC", 6), ("0xbbb", "WETH", 18))
      .toDF("contract", "symbol", "decimals")
    val stream = MemoryStream[(String, Double)]
    val out = StreamingEtl.enrichWithDim(
      stream.toDS().toDF("contract", "amount"), dim, "contract")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("enriched_out").start()
    try {
      stream.addData(("0xaaa", 5.0), ("0xccc", 7.0))
      q.processAllAvailable()
      val rows = spark.table("enriched_out")
        .collect().map(r => (r.getString(0), Option(r.getString(2)))).toSet
      // matched row enriched; unmatched kept with nulls (left join)
      assert(rows == Set("0xaaa" -> Some("USDC"), "0xccc" -> None))
    } finally q.stop()
  }

  test("restart from checkpoint resumes exactly-once: no loss, no dupes") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val stream = MemoryStream[String]
    val msgs = Fixtures.syntheticTransferMessages(120)
    def start() = StreamingEtl.decodeTransfers(stream.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("parquet").option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    val q1 = start()
    stream.addData(msgs.take(70): _*)
    q1.processAllAvailable()
    q1.stop() // crash/deploy boundary: offsets live in the checkpoint
    val q2 = start()
    try {
      stream.addData(msgs.drop(70): _*)
      q2.processAllAvailable()
      val streamed = spark.read.parquet(s"$dir/out")
      val batch = TokenTransferDecoder.decode(Ingest.parseRaw(spark, msgs))
      // exactly-once across the restart: same rows as one batch pass,
      // and no transfer id appears twice
      assert(streamed.count() == batch.count())
      assert(streamed.select("tx_hash").distinct().count() ==
        batch.select("tx_hash").distinct().count())
      assert(streamed.distinct().count() == batch.distinct().count())
    } finally q2.stop()
  }

  test("AvailableNow trigger drains a file-source backlog once and stops") {
    // the batch↔stream unification behind S4 backfill: the same streaming
    // transform replays a directory backlog exactly once, then terminates
    // on its own — no always-on cluster for catch-up jobs
    val dir = java.nio.file.Files.createTempDirectory("graft_avnow").toString
    val msgs = Fixtures.syntheticTransferMessages(80)
    spark.createDataset(msgs)(org.apache.spark.sql.Encoders.STRING)
      .repartition(4).write.mode("overwrite").text(s"$dir/in")
    val raw = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL("value STRING"))
      .text(s"$dir/in").as[String]
    val q = StreamingEtl.decodeTransfers(raw)
      .writeStream.outputMode(OutputMode.Append())
      .format("parquet").option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "backfill did not terminate")
    val streamed = spark.read.parquet(s"$dir/out").count()
    val batch = graft.etl.TokenTransferDecoder
      .decode(Ingest.parseRaw(spark, msgs)).count()
    assert(streamed == batch && streamed > 0)
  }

  test("maxFilesPerTrigger paces a backfill into bounded micro-batches") {
    // the throttle that keeps a month-long backlog from becoming one
    // giant micro-batch: bounded work per trigger, steady checkpoints
    val dir = java.nio.file.Files.createTempDirectory("graft_paced").toString
    val msgs = Fixtures.syntheticTransferMessages(60)
    spark.createDataset(msgs)(org.apache.spark.sql.Encoders.STRING)
      .repartition(6).write.mode("overwrite").text(s"$dir/in")
    val raw = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL("value STRING"))
      .option("maxFilesPerTrigger", "2")
      .text(s"$dir/in").as[String]
    val q = StreamingEtl.decodeTransfers(raw)
      .writeStream.outputMode(OutputMode.Append())
      .format("parquet").option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 3, // 6 files / 2 per trigger
      s"expected >=3 paced batches, saw ${batches.length}")
    assert(spark.read.parquet(s"$dir/out").count() ==
      graft.etl.TokenTransferDecoder
        .decode(Ingest.parseRaw(spark, msgs)).count())
  }

  test("decayed feature state is exact under any micro-batch slicing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // 60 events from the driver fixture, as (ts, type, value) tuples
    val rows = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("event_type"), col("value"))
      .orderBy("event_id").limit(60)
      .as[(java.sql.Timestamp, String, Double)].collect().toSeq
    val anchor = rows.map(_._1.getTime).min * 1000L // micros
    def runSliced(slices: Seq[Seq[(java.sql.Timestamp, String, Double)]],
                  name: String): Map[String, (Long, Long)] = {
      val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
      val out = StreamingEtl.decayedTotals(
        stream.toDS().toDF("ts", "event_type", "value"), anchor, 7.0)
      val q = out.writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName(name).start()
      try {
        slices.foreach { b => stream.addData(b); q.processAllAvailable() }
      } finally q.stop()
      // positive values => sum_fx is monotone, so max == the final update
      spark.table(name).groupBy("key")
        .agg(max("sum_fx").as("s"), max("n").as("n"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    }
    val a = runSliced(Seq(rows.take(7), rows.slice(7, 40), rows.drop(40)), "decay_a")
    val b = runSliced(rows.grouped(9).toSeq, "decay_b")
    assert(a == b, "state must not depend on batch boundaries")
    // one-shot batch twin: identical term expression, plain groupBy sum
    val batch = spark.createDataset(rows).toDF("ts", "event_type", "value")
      .select(col("event_type"),
        round(col("value") * pow(lit(2.0),
          (unix_micros(col("ts")) - lit(anchor)) / lit(86400e6 * 7.0))
          * lit(1e6), 0).cast("long").as("t"))
      .groupBy("event_type")
      .agg(sum("t").as("s"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(a == batch, "streaming state must equal the one-shot batch sum")
  }

  test("streaming image dedup flags perceptual duplicates across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.mm.Codecs
    val w = 16
    def img(seed: Int): Array[Byte] =
      Codecs.encodeBmp(Array.tabulate(w * 24 * 3)(i =>
        ((i * seed + seed * 7) % 251).toByte), w)
    def dh(b: Array[Byte]) = Codecs.dHash(Codecs.decodeBmp(b).get, w)
    // ids 1..6: 1 and 4 identical content; 2 and 6 identical; rest unique
    val imgs = Map(1L -> img(3), 2L -> img(5), 3L -> img(11),
      4L -> img(3), 5L -> img(17), 6L -> img(5))
    val rows = imgs.toSeq.sortBy(_._1).map { case (id, b) => (id, dh(b)) }
    val stream = MemoryStream[(Long, Long)]
    val q = StreamingEtl.imageDedupStream(
        stream.toDS().toDF("media_id", "dhash"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("img_dedup").start()
    try {
      stream.addData(rows.take(3)); q.processAllAvailable()
      stream.addData(rows.drop(3)); q.processAllAvailable() // 4,6 dup across batches
      val got = spark.table("img_dedup").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(got(1L) == ((1L, false)) && got(4L) == ((1L, true)))
      assert(got(2L) == ((2L, false)) && got(6L) == ((2L, true)))
      assert(got(3L) == ((3L, false)) && got(5L) == ((5L, false)))
    } finally q.stop()
  }

  test("streaming KMV distinct == the batch sketch EXACTLY, any slicing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val k = 8 // small k so the estimator branch engages on the fixture
    val rows = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("user_id"))
      .orderBy("event_id").limit(500)
      .as[(String, Long)].collect().toSeq
    graft.functions.KmvFunctions.register(spark)
    val batch = spark.createDataset(rows).toDF("event_type", "user_id")
      .groupBy("event_type")
      .agg(graft.functions.KmvFunctions
        .kmvDistinct(col("user_id").cast("string"), k).as("est"))
      .as[(String, Double)].collect().toMap
    def runSliced(slices: Seq[Seq[(String, Long)]], name: String) = {
      val stream = MemoryStream[(String, Long)]
      val out = StreamingEtl.runningDistinct(
        stream.toDS().toDF("event_type", "user_id"), k)
      val q = out.writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName(name).start()
      try {
        slices.foreach { b => stream.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).groupBy("key")
        .agg(max(struct(col("n_rows"), col("distinct_est"))).as("f"))
        .select(col("key"), col("f.distinct_est"))
        .as[(String, Double)].collect().toMap
    }
    val a = runSliced(Seq(rows), "kmv_one")
    val b = runSliced(rows.grouped(41).toSeq, "kmv_41")
    // order-invariant min-merge: streaming state == one-shot batch sketch
    // BIT-IDENTICALLY, not within a bound
    assert(a == batch, s"$a\n$batch")
    assert(b == batch)
    // estimator branch engaged iff some type exceeds k distinct users —
    // assert from ground truth so the test can't silently go vacuous
    val trueDistinct = rows.groupBy(_._1).map { case (t, vs) =>
      t -> vs.map(_._2).distinct.size }
    assert(trueDistinct.values.exists(_ > k),
      s"fixture prefix never exceeds k=$k distinct: $trueDistinct")
    assert(batch.values.exists(v => v != math.rint(v)))
  }

  test("streaming HLL estimate == the batch sketch EXACTLY, any slicing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val p = 8
    val rows = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("user_id"))
      .orderBy("event_id").limit(500)
      .as[(String, Long)].collect().toSeq
    graft.functions.HllFunctions.register(spark)
    val batch = spark.createDataset(rows).toDF("event_type", "user_id")
      .groupBy("event_type")
      .agg(graft.functions.HllFunctions
        .hllSketch(col("user_id").cast("string"), p).as("regs"))
      .collect().map { r =>
        val regs = r.getSeq[Int](1).toSeq
        r.getString(0) -> ((regs.count(_ == 0).toLong,
          graft.functions.HllFunctions.estimateFrom(regs, p)))
      }.toMap
    def runSliced(slices: Seq[Seq[(String, Long)]], name: String) = {
      val stream = MemoryStream[(String, Long)]
      val out = StreamingEtl.runningHllDistinct(
        stream.toDS().toDF("event_type", "user_id"), p)
      val q = out.writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName(name).start()
      try {
        slices.foreach { b => stream.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).groupBy("key")
        .agg(max(struct(col("n_rows"), col("v_empty"), col("hll_est"))).as("f"))
        .select(col("key"), col("f.v_empty"), col("f.hll_est"))
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    }
    // max-merge is order-invariant and duplicate-absorbing: the streaming
    // registers — hence v_empty AND the bit-level double estimate — equal
    // the one-shot batch aggregate under any slicing
    assert(runSliced(Seq(rows), "hll_one") == batch)
    assert(runSliced(rows.grouped(47).toSeq, "hll_47") == batch)
    // the fixture engages real estimates (non-integer), not just counts
    assert(batch.values.exists { case (_, e) => e != math.rint(e) })
  }

  test("streaming CMS matrix == the batch sketch EXACTLY, any slicing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val (d, w) = (4, 64)
    val rows = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("user_id"))
      .orderBy("event_id").limit(400)
      .as[(String, Long)].collect().toSeq
    graft.functions.CountMinFunctions.register(spark)
    val batch = spark.createDataset(rows).toDF("event_type", "user_id")
      .groupBy("event_type")
      .agg(graft.functions.CountMinFunctions
        .countMin(col("user_id").cast("string"), d, w).as("m"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[scala.collection.Seq[Long]](1).flatMap(_.toSeq).toVector)
      .toMap
    def runSliced(slices: Seq[Seq[(String, Long)]], name: String) = {
      val stream = MemoryStream[(String, Long)]
      val out = StreamingEtl.runningFrequencies(
        stream.toDS().toDF("event_type", "user_id"), d, w)
      val q = out.writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName(name).start()
      try {
        slices.foreach { b => stream.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).groupBy("key")
        .agg(max(struct(col("n_rows"), col("cells"))).as("f"))
        .select(col("key"), col("f.cells"))
        .collect().map(r => r.getString(0) ->
          r.getSeq[Long](1).toVector).toMap
    }
    assert(runSliced(Seq(rows), "cms_one") == batch)
    assert(runSliced(rows.grouped(53).toSeq, "cms_53") == batch)
  }

  test("streaming weighted sample == the batch A-ES sample, any slicing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batch = graft.queries.Relational6
      .queries("q_weighted_sample")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, rs) => t -> rs.sortBy(_._2).map(_._3).toSeq }
    val rows = graft.queries.Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"))
      .orderBy("event_id")
      .as[(String, Long, Double)].collect().toSeq
    def run(slices: Seq[Seq[(String, Long, Double)]], name: String) = {
      val stream = MemoryStream[(String, Long, Double)]
      val out = StreamingEtl.runningWeightedSample(
        stream.toDS().toDF("event_type", "event_id", "value"))
      val q = out.writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName(name).start()
      try {
        slices.foreach { b => stream.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
        .groupBy(_._1)
        .map { case (t, us) => t -> us.maxBy(_._2)._3.toSeq }
    }
    for ((slices, name) <- Seq(
        (Seq(rows), "ws_one"), (rows.grouped(97).toSeq, "ws_97"))) {
      val got = run(slices, name)
      assert(got.keySet == batch.keySet, name)
      got.foreach { case (t, ids) =>
        assert(ids == batch(t), s"$name/$t: $ids vs ${batch(t)}")
      }
    }
  }

  test("streaming PSI: slicing-invariant, stable ~0, planted drift fires") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val (v0, v1) = (0.0, 100.0)
    // reference: uniform over buckets for type A; skewed low for type B
    val ref = Map(
      "A" -> Array.fill(10)(100L),
      "B" -> Array(500L, 300L, 100L, 50L, 30L, 10L, 5L, 3L, 1L, 1L))
    // stream: A stays uniform (stable); B arrives uniform (drifted)
    val rows = (0 until 1000).map(i => ("A", (i % 100).toDouble)) ++
      (0 until 1000).map(i => ("B", (i % 100).toDouble))
    def run(slices: Seq[Seq[(String, Double)]], name: String) = {
      val stream = MemoryStream[(String, Double)]
      val out = StreamingEtl.runningPsi(
        stream.toDS().toDF("event_type", "value"), ref, v0, v1)
      val q = out.writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName(name).start()
      try {
        slices.foreach { b => stream.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (k, us) => k -> us.maxBy(_._2) }
    }
    val one = run(Seq(rows), "psi_one")
    val sliced = run(rows.grouped(73).toSeq, "psi_73")
    assert(one("A") == sliced("A") && one("B") == sliced("B"))
    assert(one("A")._2 == 1000L && one("B")._2 == 1000L)
    assert(math.abs(one("A")._3) < 0.01, one("A"))   // stable
    assert(one("B")._3 > 0.25, one("B"))             // drifted
    // independent recomputation of the emitted PSI for B
    val cur = Array.fill(10)(100L)
    val nr = ref("B").sum + 10.0; val nc = 1010.0
    val fx = (0 until 10).map { i =>
      val p = (ref("B")(i) + 1) / nr; val q = (cur(i) + 1) / nc
      BigDecimal((p - q) * math.log(p / q) * 1e12)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.sum
    val expect = BigDecimal(fx / 1e12)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(one("B")._3 == expect)
  }

  test("streaming Misra-Gries: MG guarantee holds for rows seen, any slicing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val k = 8
    val rows = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("user_id"))
      .orderBy("event_id").limit(500)
      .as[(String, Long)].collect().toSeq
    val exact: Map[String, Map[String, Long]] = rows.groupBy(_._1)
      .map { case (t, vs) =>
        t -> vs.groupBy(_._2.toString).map { case (u, g) => u -> g.size.toLong } }
    def runSliced(slices: Seq[Seq[(String, Long)]], name: String) = {
      val stream = MemoryStream[(String, Long)]
      val out = StreamingEtl.runningHeavyHitters(
        stream.toDS().toDF("event_type", "user_id"), k)
      val q = out.writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName(name).start()
      try {
        slices.foreach { b => stream.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getMap[String, Long](2)))
        .groupBy(_._1)
        .map { case (key, updates) =>
          val last = updates.maxBy(_._2)
          key -> ((last._2, last._3))
        }
    }
    for ((slices, name) <- Seq(
        (Seq(rows), "mg_one"),
        (rows.grouped(59).toSeq, "mg_59"))) {
      val got = runSliced(slices, name)
      assert(got.keySet == exact.keySet, name)
      for ((key, (n, items)) <- got) {
        val tf = exact(key)
        assert(n == tf.values.sum, s"$name/$key: n")
        val slack = n / (k + 1)
        assert(items.size <= k, s"$name/$key: more than k counters")
        // estimates never overcount, undercount by at most n/(k+1)
        items.foreach { case (item, est) =>
          val f = tf.getOrElse(item, 0L)
          assert(est <= f && est >= f - slack, s"$name/$key/$item: $est vs $f")
        }
        // every true heavy item (f > n/(k+1)) survives
        tf.foreach { case (item, f) =>
          if (f > slack)
            assert(items.contains(item), s"$name/$key: lost heavy item $item")
        }
      }
    }
  }

  test("streaming KLL quantiles: exact n, rank bound holds under any slicing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("value"))
      .orderBy("event_id").limit(400)
      .as[(String, Double)].collect().toSeq
    val exact = rows.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).sorted.toIndexedSeq }
    def runSliced(slices: Seq[Seq[(String, Double)]], name: String) = {
      val stream = MemoryStream[(String, Double)]
      val out = StreamingEtl.runningQuantiles(
        stream.toDS().toDF("event_type", "value"), k = 64)
      val q = out.writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName(name).start()
      try {
        slices.foreach { b => stream.addData(b); q.processAllAvailable() }
      } finally q.stop()
      // n grows monotonically, so max(n) rows are the final updates
      spark.table(name).groupBy("key")
        .agg(max(struct(col("n"), col("p50"), col("p90"))).as("f"))
        .select(col("key"), col("f.n"), col("f.p50"), col("f.p90"))
        .as[(String, Long, Double, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    }
    for ((slices, name) <- Seq(
        (Seq(rows), "kll_one"),
        (rows.grouped(37).toSeq, "kll_37"),
        (Seq(rows.take(5), rows.slice(5, 300), rows.drop(300)), "kll_mix"))) {
      val got = runSliced(slices, name)
      assert(got.keySet == exact.keySet)
      for ((key, (n, p50, p90)) <- got) {
        val sorted = exact(key)
        assert(n == sorted.length.toLong, s"$name/$key: n")
        // rank bound: (L+2)·n/k with L from the deepest possible level
        val l = math.max(1, 64 - java.lang.Long
          .numberOfLeadingZeros(math.max(1L, n / 64)))
        val bound = (l + 2).toDouble * n / 64
        for ((phi, est) <- Seq(0.5 -> p50, 0.9 -> p90)) {
          val target = math.ceil(phi * n).toLong
          val lo = sorted.count(_ < est) + 1
          val hi = sorted.count(_ <= est)
          val err = if (target < lo) lo - target
            else if (target > hi) target - hi else 0L
          assert(err <= bound, s"$name/$key phi=$phi err=$err bound=$bound")
        }
      }
    }
  }

  test("decayed totals fail loudly on null inputs, not with an encoder NPE") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val anchor = 1700000000000000L
    val stream = MemoryStream[(Long, String, java.lang.Double)]
    val out = StreamingEtl.decayedTotals(
      stream.toDS().select(timestamp_micros(col("_1")).as("ts"),
        col("_2").as("event_type"), col("_3").as("value")), anchor, 7.0)
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("decay_null").start()
    try {
      stream.addData((anchor, "click", null: java.lang.Double))
      val e = intercept[Exception] { q.processAllAvailable() }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(_.contains("non-null value")),
        chain(e).mkString("\n"))
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

/** Kafka wiring tests — option mapping and record shaping are pure
  * functions; no broker exists in this sandbox, so `.load()`/`.start()`
  * (which resolve the connector) are exercised only in deployments. */
class KafkaIOSpec extends SparkSpec {

  test("source options carry the reference's topic layout") {
    val opts = KafkaIO.sourceOptions(KafkaIO.SourceConfig(
      bootstrapServers = "broker:9092", startingOffsets = "earliest",
      maxOffsetsPerTrigger = Some(50000L)))
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribe") ==
      "blockchain.blocks.raw,blockchain.transactions.raw," +
      "blockchain.logs.raw,blockchain.token_transfers.raw")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("maxOffsetsPerTrigger") == "50000")
    assert(opts("failOnDataLoss") == "false")
  }

  test("sink records: key = tx_hash, value = round-trippable JSON") {
    val decoded = TokenTransferDecoder.decode(Ingest.parseRaw(spark,
      Fixtures.syntheticTransferMessages(20)))
    val recs = KafkaIO.sinkRecords(decoded)
    assert(recs.columns.toSeq == Seq("key", "value"))
    val rows = recs.collect()
    assert(rows.length == decoded.count())
    val hashes = decoded.select("tx_hash").collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).toSet == hashes)
    // value JSON parses back to the decoded schema with matching contracts
    import org.apache.spark.sql.functions.{col, from_json}
    val parsed = recs.select(
      from_json(col("value"), decoded.schema).as("t")).select("t.contract")
    assert(parsed.collect().map(_.getString(0)).toSet ==
      decoded.select("contract").collect().map(_.getString(0)).toSet)
  }

  test("sink records: empty-string tx_hash falls through to block_number") {
    // `key or str(block_number)` in the reference is a falsy check — swap
    // records carry tx_hash='' and must NOT all share Kafka key ''
    import spark.implicits._
    val rows = Seq(("", 18000000L), ("0x" + "c" * 64, 18000001L))
      .toDF("tx_hash", "block_number")
    val recs = KafkaIO.sinkRecords(rows).collect()
    assert(recs.map(_.getString(0)).toSet == Set("18000000", "0x" + "c" * 64))
  }

  test("sink records fall back to block_number when no tx_hash column") {
    import spark.implicits._
    val rows = Seq((18000000L, "a"), (18000001L, "b"))
      .toDF("block_number", "payload")
    val recs = KafkaIO.sinkRecords(rows).collect()
    assert(recs.map(_.getString(0)).toSet == Set("18000000", "18000001"))
  }

  test("sink options pin topic and checkpoint") {
    val opts = KafkaIO.sinkOptions(KafkaIO.SinkConfig(
      "broker:9092", checkpointLocation = "/tmp/ckpt"))
    assert(opts("topic") == "blockchain.token_transfers.raw")
    assert(opts("checkpointLocation") == "/tmp/ckpt")
  }

  test("envelope values feed the standard decode transform") {
    import spark.implicits._
    val kafkaShaped = Fixtures.syntheticTransferMessages(10)
      .map(m => ("k".getBytes, m.getBytes)).toDF("key", "value")
    val decoded = TokenTransferDecoder.decode(
      graft.etl.Ingest.parseRaw(KafkaIO.envelopeValues(kafkaShaped)))
    assert(decoded.count() == 10)
  }

  // ------------------------------------------------------------------
  // Round trip through EmbeddedTopicLog — the transport contract a real
  // broker applies (murmur2 key routing, per-partition offset logs, the
  // Kafka source schema, offset-based resume), exercised end to end.
  // ------------------------------------------------------------------

  /** 40 transfer envelopes with DISTINCT tx hashes (the bulk fixture
    * reuses one default hash, which would collapse partitioning). */
  private def distinctTransfers: Seq[String] = (0 until 40).map { i =>
    Fixtures.transferMessage(
      blockNumber = 19000000L + i * 10L,
      logIndex = i.toLong,
      txHash = "0x" + f"$i%063x" + "c")
  }

  test("round trip: produce → partitions → offsets → consume → decode, four topics") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val broker = new EmbeddedTopicLog(numPartitions = 4)
    val transfers = distinctTransfers
    val txs = Fixtures.syntheticTxMessages(30)
    val swaps = (0 until 12).map(i =>
      Fixtures.swapMessage(blockNumber = 18000100L + i,
        amount0In = BigInt(i + 1), amount1Out = BigInt(2 * i + 1),
        txHash = "0x" + f"$i%063x" + "f"))
    // real block envelopes ALWAYS carry payload.hash (kafka_producer.py:162)
    val blockHash = (i: Int) => "0x" + f"$i%063x" + "b"
    val blocks = (0 until 8).map(i =>
      s"""{"chain_id": 1, "network": "ethereum-mainnet", "block_number": ${18000200L + i},
         | "block_timestamp": ${Fixtures.FixedNow}, "event_type": "block",
         | "payload": {"hash": "${blockHash(i)}", "miner": "0x${"9" * 40}", "gas_used": 12000000},
         | "ingested_at": ${Fixtures.FixedNow}.0}""".stripMargin.replaceAll("\n", ""))

    // produce through the REAL record shaping (reference key rule)
    broker.produceFrame(KafkaIO.TopicTokenTransfers,
      KafkaIO.envelopeRecords(transfers.toDS()))
    broker.produceFrame(KafkaIO.TopicTransactions,
      KafkaIO.envelopeRecords(txs.toDS()))
    broker.produceFrame(KafkaIO.TopicLogs, KafkaIO.envelopeRecords(swaps.toDS()))
    broker.produceFrame(KafkaIO.TopicBlocks, KafkaIO.envelopeRecords(blocks.toDS()))

    // (1) the consumer frame has EXACTLY the Spark Kafka source schema
    val kafka = broker.consumeAll(spark, KafkaIO.AllTopics)
    assert(kafka.schema == broker.kafkaSourceSchema)
    assert(kafka.count() == transfers.size + txs.size + swaps.size + blocks.size)

    // (2) same key → same partition, routed by the DefaultPartitioner
    val routed = kafka.select("key", "partition").collect()
      .map(r => (new String(r.getAs[Array[Byte]](0), "UTF-8"), r.getInt(1)))
    routed.foreach { case (k, p) =>
      assert(p == broker.partitionFor(k), s"key $k routed to $p")
    }
    assert(routed.map(_._2).distinct.length > 1, "keys spread over partitions")

    // (3) offsets are dense from 0 per (topic, partition) and ordered
    val offs = kafka.select("topic", "partition", "offset").collect()
      .groupBy(r => (r.getString(0), r.getInt(1)))
    offs.foreach { case (tp, rows) =>
      val sorted = rows.map(_.getLong(2)).sorted
      assert(sorted.toSeq == (0L until sorted.length).toSeq,
        s"offsets not dense for $tp: ${sorted.toSeq}")
    }

    // (4) key rule per event_type (kafka_producer.py:172,196,229):
    // block envelopes keyed by the BLOCK HASH, transaction envelopes by
    // the tx hash, token_transfer/log envelopes by str(block_number)
    // (published keyless — their payload.tx_hash never routes)
    def keysOf(topic: String): Set[String] =
      kafka.filter(col("topic") === topic).select("key").collect()
        .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")).toSet
    assert(keysOf(KafkaIO.TopicBlocks) == (0 until 8).map(blockHash).toSet)
    assert(keysOf(KafkaIO.TopicTokenTransfers) ==
      (0 until 40).map(i => (19000000L + i * 10L).toString).toSet)
    assert(keysOf(KafkaIO.TopicLogs) ==
      (0 until 12).map(i => (18000100L + i).toString).toSet)

    // (5) the consumed transfers decode IDENTICALLY to the direct path
    val viaBroker = TokenTransferDecoder.decode(graft.etl.Ingest.parseRaw(
      KafkaIO.envelopeValues(
        kafka.filter(col("topic") === KafkaIO.TopicTokenTransfers))))
    val direct = TokenTransferDecoder.decode(
      graft.etl.Ingest.parseRaw(spark, transfers))
    val key = (r: org.apache.spark.sql.Row) => r.getAs[String]("tx_hash")
    assert(viaBroker.collect().sortBy(key).toSeq ==
      direct.collect().sortBy(key).toSeq)
  }

  test("round trip: exactly-once resume from committed offsets") {
    import spark.implicits._
    val broker = new EmbeddedTopicLog(numPartitions = 4)
    val topic = KafkaIO.TopicTokenTransfers
    val first = distinctTransfers.take(25)
    val second = distinctTransfers.drop(25)

    broker.produceFrame(topic, KafkaIO.envelopeRecords(first.toDS()))
    val batch1 = broker.consumeFrom(spark, topic, Map.empty)
    val committed = broker.endOffsets(topic) // the checkpoint a sink commits

    // "crash" here; more data arrives while we're down
    broker.produceFrame(topic, KafkaIO.envelopeRecords(second.toDS()))

    // resume from the committed offsets: ONLY the new records appear
    val batch2 = broker.consumeFrom(spark, topic, committed)
    def values(df: org.apache.spark.sql.DataFrame): Seq[String] =
      KafkaIO.envelopeValues(df).collect().toSeq
    assert(batch1.count() == 25 && batch2.count() == 15)
    assert(values(batch1).toSet.intersect(values(batch2).toSet).isEmpty,
      "a record must never be delivered to both epochs")
    assert((values(batch1) ++ values(batch2)).sorted ==
      distinctTransfers.sorted, "union of epochs covers every record once")

    // resuming again from the same checkpoint is deterministic (replay)
    assert(values(broker.consumeFrom(spark, topic, committed)).sorted ==
      values(batch2).sorted)
  }

  test("RocksDB state store provider: same watermarked agg, no code change") {
    // DEPLOY's "for very large keyed state, set the RocksDB state store
    // provider — no code change" claim, asserted: the identical
    // StreamingEtl transform runs under RocksDB-backed state and produces
    // the same hourly windows as the batch groupBy, and the query's
    // progress proves RocksDB actually held the state.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[String]
    val out = StreamingEtl.hourlyTransferVolume(
      StreamingEtl.decodeTransfers(stream.toDS()))
    val q = out.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("hourly_rocksdb").start()
    try {
      val msgs = Fixtures.syntheticTransferMessages(120)
      stream.addData(msgs.take(60): _*)
      q.processAllAvailable()
      stream.addData(msgs.drop(60): _*)
      q.processAllAvailable()

      val streamed = spark.table("hourly_rocksdb")
        .select("hour_bucket", "standard", "transfer_count")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      val batch = TokenTransferDecoder.decode(Ingest.parseRaw(spark, msgs))
        .groupBy(date_trunc("hour", col("block_timestamp")).as("hour_bucket"),
          col("standard"))
        .agg(count(lit(1)).as("transfer_count"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(streamed == batch && streamed.nonEmpty)

      // the state operator must report RocksDB-specific metrics — proof the
      // provider swap engaged rather than silently falling back
      val metrics = q.lastProgress.stateOperators.flatMap(
        _.customMetrics.keySet.toArray(Array.empty[String]))
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"expected RocksDB state metrics, got: ${metrics.mkString(",")}")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
