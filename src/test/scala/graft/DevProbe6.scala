package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for dedup_incremental at sf0.1 (dev harness,
  * like DevProbe*: not part of the engine). */
object DevProbe6 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.Dedup
    val d = graft.queries.Tables.documents(spark, dir)
    val isEx = substring(md5(col("doc_id").cast("string")), 1, 12) <
      graft.analytics.EventAnalytics.TrainBoundary
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val ex = d.filter(isEx)
    val inc = d.filter(!isEx)
    timed("shingled(existing)")(noop(Dedup.shingled(ex)))
    timed("minhash(existing)")(noop(Dedup.minhashFromShingles(Dedup.shingled(ex))))
    timed("bands(existing)")(noop(Dedup.bandKeys(Dedup.minhashFromShingles(Dedup.shingled(ex)))))
    timed("bands(increment)")(noop(Dedup.bandKeys(Dedup.minhashFromShingles(Dedup.shingled(inc)))))
    val candQ = Dedup.bandKeys(Dedup.minhashFromShingles(Dedup.shingled(inc)))
      .join(Dedup.bandKeys(Dedup.minhashFromShingles(Dedup.shingled(ex)))
        .withColumnRenamed("doc_id", "ex_id"), Seq("band", "sig"))
      .select(col("doc_id"), col("ex_id")).distinct()
    timed("candidates")(noop(candQ))
    println("[probe] n_cand=" + candQ.count() +
      " n_cand_docs=" + candQ.select("doc_id").distinct().count() +
      " n_cand_ex=" + candQ.select("ex_id").distinct().count())
    timed("full incrementalFlags")(noop(Dedup.incrementalFlags(ex, inc, 0.5)))
    spark.stop()
  }
}
