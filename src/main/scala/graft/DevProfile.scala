package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.queries.Tables

/** Dev-only profiling harness for hot queries (not part of the contract). */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    time("tokens only") {
      docs.select(graft.text.TextOps.tokens(col("text")).as("t"))
        .select(sum(size(col("t")))).collect()(0).getLong(0)
    }
    time("shingled explode") { Dedup.shingled(docs).count() }
    time("shingled + groupBy sizes") {
      Dedup.shingled(docs).groupBy("doc_id").count().count()
    }
    time("self-join count") {
      val sh = Dedup.shingled(docs)
      sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .count()
    }
    time("full jaccardPairs") { Dedup.jaccardPairs(docs, 0.5).count() }
    time("jaccardPairs again (cached)") { Dedup.jaccardPairs(docs, 0.5).count() }
    time("pair join only (md5 key)") {
      val sh = Dedup.shingled(docs)
        .select(col("doc_id"), md5(col("shingle")).as("shingle"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).count().count()
      sh.unpersist(); n
    }
    spark.stop()
  }
}
