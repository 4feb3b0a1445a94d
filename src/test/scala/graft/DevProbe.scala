package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
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
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm

    def time(name: String)(f: => Long): Unit = {
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
        spark.catalog.clearCache()
      }
    }

    def pairJoin(sh: org.apache.spark.sql.DataFrame): Long = {
      val s = sh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = s.as("a").join(s.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).count().count()
      s.unpersist(); n
    }

    time("join on raw shingle") { pairJoin(Dedup.shingled(docs)) }
    time("join on unhex(md5)") {
      pairJoin(Dedup.shingled(docs)
        .select(col("doc_id"), unhex(md5(col("shingle"))).as("shingle")))
    }
    time("join on xxhash64") {
      pairJoin(Dedup.shingled(docs)
        .select(col("doc_id"), xxhash64(col("shingle")).as("shingle")))
    }
    spark.stop()
  }
}
