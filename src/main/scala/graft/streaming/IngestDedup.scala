package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.{Dedup, IncrementalIndex}

/** End-to-end streaming ingest dedup: every arriving document is flagged
  * against (1) the accumulated reference corpus — BOTH layers, exact
  * digest AND LSH near-dup, probed off the corpus's materialized
  * [[graft.dedup.IncrementalIndex]] — and (2) documents seen earlier in
  * the stream itself (exact layer). One row lands per document in the
  * compacted `flags` table:
  *
  *   (doc_id, exact_match, near_match, stream_match,
  *    verdict ∈ exact_dup | near_dup | stream_dup | keep)
  *
  * with corpus verdicts taking precedence (a doc matching the corpus is
  * `exact_dup`/`near_dup` exactly as in [[Dedup.incrementalFlags]]; only
  * a would-be `keep` is downgraded to `stream_dup` when an earlier stream
  * doc had identical text).
  *
  * ALL mutable state lives in compacted tables maintained through
  * [[UpsertSink]]'s crash-safe swap — no Spark state store:
  *
  *  - `<state>/flags`: the output, upserted by doc_id.
  *  - `<state>/stream_digests`: (h, first_id) — smallest stream doc_id
  *    per content digest, merged min-per-key.
  *
  * Exactly-once across restart without transactions: every per-batch
  * computation is DETERMINISTIC given (batch rows, corpus index), and
  * both table merges are IDEMPOTENT (same-key re-merge compacts to the
  * identical table). "Earlier in the stream" is doc_id order — with
  * ingest-monotone ids this equals arrival order, and crucially it makes
  * a replayed batch self-consistent even when the crash happened AFTER
  * the digest merge but BEFORE the flags merge: the replay sees its own
  * digests in `stream_digests`, and the `first_id < doc_id` guard plus
  * the in-batch window reproduce the exact pre-crash flags. StreamingSpec
  * proves it: 3 micro-batches with a mid-stream restart produce flags
  * equal to the one-shot [[batchTwin]] on the same data.
  *
  * Scale shape per batch: the increment is shingled once; the corpus
  * index is probed (digest equi-join, band-bucket join, candidate-
  * restricted verify) — O(increment + matched index rows), never
  * O(corpus). The flags/stream_digests rewrite is the plain-parquet
  * trade documented on [[UpsertSink]]; at 100 TB those two small
  * compacted tables become MERGE targets in a transactional format while
  * every transform here is unchanged.
  */
object IngestDedup {

  /** One-shot batch equivalent of the whole streaming pipeline, for
    * verification: [[Dedup.incrementalFlags]] plus the stream-dup layer
    * expressed as a window (smallest earlier doc_id with the same
    * digest). The streaming run over ANY batching of `increment` (ids
    * monotone across batches) lands exactly this table. */
  def batchTwin(corpus: DataFrame, increment: DataFrame,
                threshold: Double): DataFrame = {
    val w = Window.partitionBy("h").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val sm = increment
      .select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("stream_match", min(col("doc_id")).over(w))
      .select(col("doc_id"), col("stream_match"))
    Dedup.incrementalFlags(corpus, increment, threshold)
      .join(sm, "doc_id")
      .select(col("doc_id"), col("exact_match"), col("near_match"),
        col("stream_match"),
        when(col("verdict") =!= "keep", col("verdict"))
          .when(col("stream_match").isNotNull, "stream_dup")
          .otherwise("keep").as("verdict"))
      .orderBy("doc_id")
  }

  /** Process one micro-batch: probe the corpus index, resolve the
    * stream-dup layer from the maintained digest table + an in-batch
    * window, land flags (upsert by doc_id) and digests (min-per-key).
    * Deterministic and idempotent — safe under foreachBatch replay. */
  def processBatch(batch: DataFrame, idxDir: String, stateDir: String,
                   threshold: Double): Unit = {
    val spark = batch.sparkSession
    val idx = IncrementalIndex.read(spark, idxDir)
    val handle = IncrementalIndex.probeManaged(batch, idx, threshold)
    try {
      val digestsPath = s"$stateDir/stream_digests"
      val fs = new org.apache.hadoop.fs.Path(digestsPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val withH = batch.select(col("doc_id"), md5(col("text")).as("h"))
      // earlier arrivals: the maintained table (strictly smaller id — a
      // replayed batch finds ITS OWN ids there and must ignore them) …
      val prior =
        if (fs.exists(new org.apache.hadoop.fs.Path(digestsPath)))
          spark.read.parquet(digestsPath)
        else withH.select(col("h"), col("doc_id").as("first_id")).limit(0)
      // … plus smaller ids within this batch
      val wInBatch = Window.partitionBy("h").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val sm = withH
        .join(prior.withColumnRenamed("first_id", "prior_id"), Seq("h"), "left")
        .withColumn("prior_id",
          when(col("prior_id") < col("doc_id"), col("prior_id")))
        .withColumn("in_batch", min(col("doc_id")).over(wInBatch))
        .select(col("doc_id"),
          least(col("prior_id"), col("in_batch")).as("stream_match"))
      val flagged = handle.df.join(sm, "doc_id")
        .select(col("doc_id"), col("exact_match"), col("near_match"),
          col("stream_match"),
          when(col("verdict") =!= "keep", col("verdict"))
            .when(col("stream_match").isNotNull, "stream_dup")
            .otherwise("keep").as("verdict"))
      // flags first, digests second: a crash between the two replays the
      // batch, which rewrites the identical flag rows (upsert by doc_id)
      UpsertSink.mergeBatchWith(flagged, s"$stateDir/flags",
        UpsertSink.latestPerKey(_, "doc_id", "doc_id"))
      UpsertSink.mergeBatchWith(
        withH.groupBy("h").agg(min(col("doc_id")).as("first_id")),
        digestsPath,
        _.groupBy("h").agg(min(col("first_id")).as("first_id")))
    } finally handle.close()
  }

  /** Start the streaming ingest-dedup into `stateDir`, probing the
    * materialized corpus index at `idxDir` (see
    * [[IncrementalIndex.write]]). */
  def start(stream: DataFrame, idxDir: String, stateDir: String,
            checkpoint: String, threshold: Double): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, idxDir, stateDir, threshold)
      }
      .start()
}
