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

    // ANN crossover study (PROFILE.md): brute-force cosine vs in-query LSH
    // filter vs pre-bucketed index probe, on ×K-replicated corpora.
    if (args.contains("ann")) {
      import graft.sim.VectorOps
      val emb = Tables.embeddings(spark, sfDir)
      val n0 = emb.count()
      def timeMin(name: String, runs: Int = 3)(f: => Long): Double = {
        val ts = (0 until runs).map { _ =>
          val t0 = System.nanoTime(); val n = f
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val best = ts.map(_._1).min
        println(f"$name%-36s ${best}%8.3f s   rows=${ts.head._2}")
        best
      }
      for (k <- Seq(500, 5000)) {
        val out = s"/tmp/graft_profile/emb_x$k"
        val big = emb.crossJoin(spark.range(k))
          .select((col("vec_id") + col("id") * 10000000L).as("vec_id"),
            col("embedding"), col("label"))
        big.repartition(32).write.mode("overwrite").parquet(out)
        val bigR = spark.read.parquet(out)
        println(s"--- corpus x$k = ${n0 * k} vectors ---")
        timeMin(s"x$k brute cosineTopK") {
          VectorOps.cosineTopK(bigR, 0L, 10).count()
        }
        timeMin(s"x$k in-query annTopK") {
          VectorOps.annTopK(bigR, 0L, 10).count()
        }
        // the 100 TB path: bucket-partitioned index built once, probe =
        // partition-pruned read of the query's bucket + exact rerank
        val idx = s"/tmp/graft_profile/emb_x${k}_bucketed"
        timeMin(s"x$k index build (one-off)", runs = 1) {
          // one file per bucket directory, not one per (bucket × partition)
          VectorOps.lshBuckets(bigR).join(bigR, "vec_id")
            .repartition(col("bucket"))
            .write.mode("overwrite").partitionBy("bucket").parquet(idx)
          bigR.count()
        }
        val qBucket = VectorOps.lshBuckets(emb)
          .filter(col("vec_id") === 0L).collect()(0).getString(1)
        timeMin(s"x$k pre-bucketed probe") {
          VectorOps.cosineTopK(
            spark.read.parquet(idx).filter(col("bucket") === qBucket), 0L, 10)
            .count()
        }
      }
      spark.stop(); return
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
