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
      spark.catalog.clearCache()
    }

    println("=== q_json_extract plan ===")
    SparkEntry.queries("q_json_extract")(spark, sfDir).explain("formatted")

    time("q_json_extract") {
      SparkEntry.queries("q_json_extract")(spark, sfDir).count()
    }
    time("dedup_near_dup") {
      SparkEntry.queries("dedup_near_dup")(spark, sfDir).count()
    }
    time("sim_cosine_topk") {
      SparkEntry.queries("sim_cosine_topk")(spark, sfDir).count()
    }
    time("sim_ann_topk") {
      SparkEntry.queries("sim_ann_topk")(spark, sfDir).count()
    }
    time("sim_ivf_topk") {
      SparkEntry.queries("sim_ivf_topk")(spark, sfDir).count()
    }
    time("dedup_lsh_pairs") {
      SparkEntry.queries("dedup_lsh_pairs")(spark, sfDir).count()
    }

    println("=== sim_ivf_topk plan ===")
    SparkEntry.queries("sim_ivf_topk")(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
