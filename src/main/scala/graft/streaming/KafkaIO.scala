package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter}

/** Kafka connector wiring for the streaming slice, mirroring the reference
  * producer's topic and key layout
  * (/root/reference/src/ingestion/kafka_producer.py:24-27 topic constants;
  * :105-111 `key or str(event.block_number)`; :154-225 per-record publish):
  * four raw topics, JSON envelope values, record key = the entity hash when
  * one exists, else the block number.
  *
  * The option mapping and record shaping are plain functions, unit-testable
  * without a broker. Everything between source and sink — decode, windowed
  * aggregation, keyed state — is source-agnostic ([[StreamingEtl]]) and
  * runs unchanged on a Kafka frame, a file stream, or a MemoryStream.
  *
  * == Verification boundary ==
  * This sandbox ships neither a Kafka broker nor the
  * `spark-sql-kafka-0-10` connector jar, and has zero network egress, so
  * no message can physically cross a real broker here: `.load()`/
  * `.start()` resolve only in a real deployment, and an embedded-broker
  * test would require the kafka server + connector dependencies this
  * build intentionally cannot resolve. What IS proven executable, via
  * KafkaIOSpec + the test-side EmbeddedTopicLog (a pure-JVM log
  * implementing the PUBLIC transport contract — murmur2
  * DefaultPartitioner routing, per-partition dense offsets, the exact
  * Kafka source schema, offset-based resumption):
  *   - the full round trip produce → keyed partition assignment →
  *     offset log → consume → [[envelopeValues]] → decode, asserted
  *     equal to the direct batch decode on all four topics;
  *   - keying (entity hash with the falsy '' fallback to block number)
  *     and same-key → same-partition routing, byte-compatible with every
  *     Kafka client's DefaultPartitioner;
  *   - exactly-once resumption: re-reading from committed end offsets
  *     replays each record precisely once across a simulated restart.
  * The untested residue is the broker binary itself (wire protocol,
  * replication, rebalancing), which belongs to the connector, not this
  * library; first-deployment smoke: `reader(...).load()` →
  * [[envelopeValues]] → `StreamingEtl.decodeTransfers` against a dev
  * broker, checkpointed to a scratch dir.
  */
object KafkaIO {

  // Topic layout (kafka_producer.py:24-27)
  val TopicBlocks         = "blockchain.blocks.raw"
  val TopicTransactions   = "blockchain.transactions.raw"
  val TopicLogs           = "blockchain.logs.raw"
  val TopicTokenTransfers = "blockchain.token_transfers.raw"
  val AllTopics: Seq[String] =
    Seq(TopicBlocks, TopicTransactions, TopicLogs, TopicTokenTransfers)

  /** Source-side configuration. `failOnDataLoss=false` mirrors the
    * producer's at-least-once posture (delivery retries, acks=all). */
  case class SourceConfig(
      bootstrapServers: String,
      topics: Seq[String] = AllTopics,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = false)

  def sourceOptions(cfg: SourceConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "subscribe" -> cfg.topics.mkString(","),
      "startingOffsets" -> cfg.startingOffsets,
      "failOnDataLoss" -> cfg.failOnDataLoss.toString
    ) ++ cfg.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  /** Configured `readStream` (format + options); callers `.load()` where a
    * broker exists. */
  def reader(spark: SparkSession, cfg: SourceConfig): DataStreamReader =
    spark.readStream.format("kafka").options(sourceOptions(cfg))

  /** Kafka source frame (binary key/value + topic/partition/offset) →
    * envelope-JSON strings, the input shape of
    * [[StreamingEtl.decodeTransfers]] and [[graft.etl.Ingest.parseRaw]]. */
  def envelopeValues(kafka: DataFrame): Dataset[String] = {
    val spark = kafka.sparkSession
    import spark.implicits._
    kafka.select(col("value").cast("string")).as[String]
  }

  case class SinkConfig(
      bootstrapServers: String,
      topic: String = TopicTokenTransfers,
      checkpointLocation: String)

  def sinkOptions(cfg: SinkConfig): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> cfg.bootstrapServers,
    "topic" -> cfg.topic,
    "checkpointLocation" -> cfg.checkpointLocation)

  /** Shape rows into Kafka records: value = full-row JSON, key = tx_hash
    * when the frame carries one (transaction/log/transfer records,
    * kafka_producer.py:196,208) falling back to block_number
    * (kafka_producer.py:105-111). Works on batch and streaming frames. */
  def sinkRecords(rows: DataFrame): DataFrame = {
    // Python's `key or str(block_number)` is a FALSY check, not a null
    // check: an empty-string tx_hash (DeFiSwapParser emits '') must fall
    // through to the block number, or every swap record would share key ''
    // and land on one Kafka partition
    val keyCols = Seq("tx_hash", "block_number")
      .filter(rows.columns.contains)
      .map(c => nullif(col(c).cast("string"), lit("")))
    require(keyCols.nonEmpty,
      "sinkRecords needs a tx_hash or block_number column to key records " +
        s"(kafka_producer.py:105-111); got: ${rows.columns.mkString(", ")}")
    rows.select(coalesce(keyCols: _*).as("key"),
      to_json(struct(rows.columns.map(col): _*)).as("value"))
  }

  /** Configured `writeStream` for decoded rows; callers `.start()` where a
    * broker exists. */
  def writer(rows: DataFrame, cfg: SinkConfig): DataStreamWriter[org.apache.spark.sql.Row] =
    sinkRecords(rows).writeStream.format("kafka").options(sinkOptions(cfg))

  /** Shape RAW envelope JSON strings into Kafka records exactly as the
    * reference producer publishes them (kafka_producer.py:105-111,
    * 154-229). Value = the envelope text verbatim. Key follows the
    * producer's per-event_type rule: `block` envelopes are published with
    * key=block hash (`payload.hash`, kafka_producer.py:172) and
    * `transaction` envelopes with key=tx hash (`payload.hash`,
    * kafka_producer.py:196); `token_transfer` and `log` envelopes are
    * published with NO key (kafka_producer.py:229), so `_publish`'s
    * `key or str(block_number)` keys them by the block number — their
    * `payload.tx_hash` is NEVER used for routing. The `or` is Python
    * truthiness, so an empty-string hash also falls to the block number.
    * This is the producer-side twin of [[envelopeValues]]; the
    * EmbeddedTopicLog round-trip test drives both through the same
    * murmur2 partition routing a real broker would apply. */
  def envelopeRecords(raw: Dataset[String]): DataFrame =
    raw.toDF("value").select(
      coalesce(
        when(get_json_object(col("value"), "$.event_type")
               .isin("block", "transaction"),
          nullif(get_json_object(col("value"), "$.payload.hash"), lit(""))),
        get_json_object(col("value"), "$.block_number")).as("key"),
      col("value"))
}
