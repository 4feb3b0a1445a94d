package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-8 dev probe (not part of the contract): accuracy/scale study of
  * the mergeable sketch family on a 10 M-row synthetic stream —
  * KLL rank error vs the exact quantile, CMS point/join-size error vs
  * width, KMV distinct error vs k. Results recorded in PROFILE.md. */
object DevProbe8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    // heavy-tailed deterministic stream: value ~ (h mod 1e6)^2 scaled,
    // key space 2^22 with zipf-ish repetition
    val base = spark.range(n)
      .select(col("id"),
        (pmod(col("id") * 2654435761L, lit(4194304L))).as("k"),
        (pmod(col("id") * 40503L, lit(1000000L))).as("u"))
      .select(col("id"), col("k"),
        (col("u") * col("u") / 1e6).as("v"))
      .localCheckpoint(true)

    // --- KLL canonical tree vs exact rank at n=10M
    var t0 = System.nanoTime()
    val (sk, cnt) = graft.queries.Sketches.kllCanonical(
      base.select(col("v"), col("id")), 256)
    val items = sk.select("v", "w").collect()
      .map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    val tKll = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val exactQ = base.stat.approxQuantile("v", Array(0.5, 0.9, 0.99), 0.0)
    val tExact = (System.nanoTime() - t0) / 1e9
    for ((phi, ex) <- Seq(0.5, 0.9, 0.99).zip(exactQ)) {
      val target = math.ceil(phi * cnt).toLong
      var cum = 0L; var est = Double.NaN
      items.foreach { case (v, w) =>
        cum += w; if (est.isNaN && cum >= target) est = v }
      val rankOfEst = base.filter(col("v") <= est).count()
      println(f"KLL n=$cnt phi=$phi est=$est%.3f exact=$ex%.3f " +
        f"rankErr=${math.abs(rankOfEst - target)} " +
        f"(${math.abs(rankOfEst - target) * 100.0 / cnt}%.4f%% of n) " +
        f"tSketch=$tKll%.1fs tExact=$tExact%.1fs")
    }

    // --- CMS point-estimate error vs width on the keyed stream
    graft.functions.CountMinFunctions.register(spark)
    val keyed = base.select(col("k").cast("string").as("s"))
    val exact = keyed.groupBy("s").count()
      .orderBy(desc("count")).limit(50).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    for (w <- Seq(512, 4096, 32768)) {
      t0 = System.nanoTime()
      val m = keyed.agg(graft.functions.CountMinFunctions
          .countMin(col("s"), 4, w))
        .collect()(0).getSeq[scala.collection.Seq[Long]](0)
        .map(_.toIndexedSeq)
      val t = (System.nanoTime() - t0) / 1e9
      val errs = exact.map { case (kk, tf) =>
        graft.functions.CountMinFunctions.estimateFrom(m, kk) - tf }
      println(f"CMS w=$w top50 maxOver=${errs.max} medOver=${errs.sorted.apply(25)} " +
        f"bound2n/w=${2 * n / w} t=$t%.1fs")
    }

    // --- KMV distinct error vs k
    graft.functions.KmvFunctions.register(spark)
    val trueDistinct = keyed.distinct().count()
    for (k <- Seq(64, 256, 1024)) {
      val est = keyed.agg(graft.functions.KmvFunctions
        .kmvDistinct(col("s"), k)).collect()(0).getDouble(0)
      println(f"KMV k=$k est=$est%.0f true=$trueDistinct " +
        f"relErr=${math.abs(est - trueDistinct) * 100.0 / trueDistinct}%.2f%%")
    }
    spark.stop()
  }
}
