package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** In-JVM stand-in for a Kafka broker implementing the PUBLIC transport
  * contract a producer/consumer pair observes, so the [[KafkaIO]] wiring
  * can be exercised end to end — produce → keyed partition assignment →
  * per-partition offset log → consume → decode — in a sandbox that ships
  * neither a broker binary nor the `spark-sql-kafka-0-10` connector jar
  * (zero egress; the dependency cannot resolve).
  *
  * What it faithfully reproduces (all public protocol knowledge):
  *   - DefaultPartitioner key routing: `(murmur2(keyBytes) & 0x7fffffff)
  *     % numPartitions` — murmur2 implemented from Austin Appleby's
  *     public-domain MurmurHash2 algorithm with Kafka's published seed
  *     0x9747b28c, so same-key records land on the same partition exactly
  *     as every compatible Kafka client routes them;
  *   - append-only per-(topic, partition) logs with dense offsets from 0,
  *     monotone CreateTime timestamps;
  *   - the consumer-facing record shape: [[consumeAll]]/[[consumeFrom]]
  *     return a DataFrame with EXACTLY the Spark Kafka source schema
  *     (key binary, value binary, topic, partition, offset, timestamp,
  *     timestampType), so downstream code ([[KafkaIO.envelopeValues]] →
  *     decode) runs unchanged against a real `spark.readStream
  *     .format("kafka").load()` frame;
  *   - offset-based resumption: [[consumeFrom]] replays from committed
  *     offsets, which is the primitive Structured Streaming's exactly-once
  *     restart contract is built on.
  *
  * What it deliberately does NOT reproduce: the wire protocol, broker
  * replication, and consumer-group rebalancing — those belong to the
  * connector and broker, not to this library's code paths. */
final class EmbeddedTopicLog(val numPartitions: Int = 4) {

  final case class Rec(topic: String, partition: Int, offset: Long,
                       key: Array[Byte], value: Array[Byte], timestamp: Long)

  private val logs = mutable.LinkedHashMap.empty[(String, Int), mutable.ArrayBuffer[Rec]]
  private var clock = 1700000000000L // deterministic CreateTime base

  private def log(topic: String, p: Int): mutable.ArrayBuffer[Rec] =
    logs.getOrElseUpdate((topic, p), mutable.ArrayBuffer.empty)

  /** MurmurHash2 (Austin Appleby, public domain), with the seed Kafka's
    * DefaultPartitioner publishes (0x9747b28c) — the exact function every
    * Kafka-compatible client uses for keyed partition routing. */
  def murmur2(data: Array[Byte]): Int = {
    val length = data.length
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ length
    var i = 0
    while (i + 4 <= length) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 4
    }
    val tail = length & 3
    if (tail == 3) h ^= (data(i + 2) & 0xff) << 16
    if (tail >= 2) h ^= (data(i + 1) & 0xff) << 8
    if (tail >= 1) { h ^= data(i) & 0xff; h *= m }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  /** Kafka's partition for a non-null key. */
  def partitionFor(key: String): Int =
    (murmur2(key.getBytes("UTF-8")) & 0x7fffffff) % numPartitions

  /** Append one keyed record; returns its (partition, offset). */
  def produce(topic: String, key: String, value: String): (Int, Long) = synchronized {
    val p = partitionFor(key)
    val l = log(topic, p)
    val off = l.length.toLong
    clock += 1
    l += Rec(topic, p, off, key.getBytes("UTF-8"), value.getBytes("UTF-8"), clock)
    (p, off)
  }

  /** Publish a [[KafkaIO.sinkRecords]]-shaped frame (key, value strings)
    * in deterministic row order — the producer side of the round trip. */
  def produceFrame(topic: String, records: DataFrame): Unit =
    records.select("key", "value").collect()
      .foreach(r => produce(topic, r.getString(0), r.getString(1)))

  /** Next offset per partition (the "end" a committed checkpoint stores). */
  def endOffsets(topic: String): Map[Int, Long] =
    (0 until numPartitions).map(p => p -> log(topic, p).length.toLong).toMap

  /** The Spark Kafka source schema, verbatim. */
  val kafkaSourceSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  private def toRows(recs: Seq[Rec]): Seq[Row] =
    recs.map(r => Row(r.key, r.value, r.topic, r.partition, r.offset,
      new java.sql.Timestamp(r.timestamp), 0 /* CreateTime */))

  /** Everything in the given topics, as a Kafka-source-schema frame. */
  def consumeAll(spark: SparkSession, topics: Seq[String]): DataFrame = {
    val recs = synchronized {
      topics.flatMap(t => (0 until numPartitions).flatMap(p => log(t, p)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(toRows(recs), math.max(1, numPartitions)),
      kafkaSourceSchema)
  }

  /** Records at or after the given per-partition starting offsets — the
    * resume-from-checkpoint read. Partitions absent from the map start
    * at 0 (Kafka's `earliest`). */
  def consumeFrom(spark: SparkSession, topic: String,
                  starting: Map[Int, Long]): DataFrame = {
    val recs = synchronized {
      (0 until numPartitions).flatMap { p =>
        log(topic, p).drop(starting.getOrElse(p, 0L).toInt)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(toRows(recs), math.max(1, numPartitions)),
      kafkaSourceSchema)
  }
}
