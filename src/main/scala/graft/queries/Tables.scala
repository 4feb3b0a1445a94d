package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All loads are plain parquet scans so Catalyst pushes filters and prunes
  * columns down to the file reader (verify with `.explain`: `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark rejects
    * (PARQUET_TYPE_ILLEGAL). Read it as nanosecond longs via the legacy conf
    * and convert to a microsecond-truncated TimestampType column — DuckDB
    * keeps nanoseconds, so oracle SQL that *outputs* raw `ts` must truncate
    * with `date_trunc('microseconds', ts)` for hash parity.
    *
    * NOTE the conf set here is session-wide and stays set: any later parquet
    * read of a TIMESTAMP(NANOS) column in the same session will also see
    * longs instead of failing loudly. Acceptable for this engine's sessions
    * (events is the only nanos table); a multi-tenant session would scope it.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
