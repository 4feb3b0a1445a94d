package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 dev probe (not part of the contract): cost of the SemDeDup
  * hot-cluster cap ([[graft.sim.VectorOps.cosinePairsBy]] sorted-
  * neighborhood sub-blocking) on an adversarially skewed corpus — EVERY
  * vector in one k-means cell, the shape that made the uncapped
  * within-cluster self-join quadratic. Results recorded in PROFILE.md.
  *
  * args: n (default 20000), cap (default 512).
  */
object DevProbe10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val cap = args.drop(1).headOption.map(_.toInt).getOrElse(512)

    // one giant geometric cluster: unit vectors fanning through a single
    // quadrant (all nearest the same centroid), dim 8, plus 1% planted
    // exact duplicates so the threshold pass has real work
    val emb = spark.range(n.toLong).select(
      col("id").as("vec_id"),
      lit(0).as("label"),
      transform(sequence(lit(0), lit(7)), d =>
        cos(col("id") % 997 / lit(997.0) + d.cast("double") / 8.0)
          .cast("float")).as("embedding"))
      .localCheckpoint(true)

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe10] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // capped: bounded O(n·cap) pair work
    val capped = time(s"capped  n=$n cap=$cap")(
      graft.sim.VectorOps.cosinePairsBy(emb, 0.999999, "label", cap).count())
    println(s"[probe10] capped pairs found: $capped")

    // uncapped: the quadratic plan — run only at a size it can finish
    val nUncapped = math.min(n,
      args.drop(2).headOption.map(_.toInt).getOrElse(20000))
    val small = emb.limit(nUncapped).localCheckpoint(true)
    val un = time(s"uncapped n=$nUncapped")(
      graft.sim.VectorOps.cosinePairsBy(small, 0.999999, "label",
        Int.MaxValue).count())
    println(s"[probe10] uncapped pairs found: $un")

    spark.stop()
  }
}
