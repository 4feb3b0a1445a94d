package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Tables

/** Dev-only micro-probe for plan variants (not part of the contract). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.events(spark, sfDir)
    ev.count() // warm

    def time(name: String)(f: => Long): Unit = {
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
      }
    }

    time("scan+substring only") {
      ev.select(col("event_id"), substring(col("props"), 1, 5).as("prefix"))
        .count()
    }
    time("current double-parse") {
      ev.select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          substring(col("props"), 1, 5).as("prefix"))
        .filter(col("k") > 50)
        .orderBy("event_id").count()
    }
    time("inline(filter(array))") {
      ev.select(inline(filter(array(struct(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("k"),
            substring(col("props"), 1, 5).as("prefix"))),
          r => r.getField("k") > 50)))
        .orderBy("event_id").count()
    }
    time("json_tuple generator") {
      ev.select(col("event_id"), substring(col("props"), 1, 5).as("prefix"),
          json_tuple(col("props"), "k").as("k"))
        .select(col("event_id"), col("k").cast("int").as("k"), col("prefix"))
        .filter(col("k") > 50)
        .select("event_id", "k", "prefix")
        .orderBy("event_id").count()
    }
    time("from_json double") {
      ev.select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"),
          substring(col("props"), 1, 5).as("prefix"))
        .filter(col("k") > 50)
        .orderBy("event_id").count()
    }
    spark.stop()
  }
}
