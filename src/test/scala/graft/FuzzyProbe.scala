package graft
import org.apache.spark.sql.SparkSession
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), expr("n_chars div 100").as("bucket"),
        substring(col("text"),1,40).as("prefix"))
    val groups = d.groupBy(col("lang"),col("bucket"),
      substring(col("prefix"),1,1).as("c1"),col("prefix"))
      .agg(min(col("doc_id")).as("pid"))
    def time(tag: String)(f: => Long): Unit = {
      val t0=System.nanoTime(); val n=f
      println(s"$tag: n=$n wall=${(System.nanoTime()-t0)/1e9}")
    }
    time("groups"){ groups.count() }
    val dpAll = groups.as("a").join(groups.as("b"),
        col("a.lang")===col("b.lang") && col("a.bucket")===col("b.bucket") &&
        col("a.c1")===col("b.c1") && col("a.pid") <= col("b.pid"))
    time("dp_enumerate"){ dpAll.count() }
    val dpLev = dpAll.withColumn("dist",
        when(col("a.pid")===col("b.pid"), lit(0L))
          .otherwise(levenshtein(col("a.prefix"), col("b.prefix")).cast("long")))
      .filter(col("dist") <= 5)
    time("dp_lev"){ dpLev.count() }
    val dpLevCap = dpAll.withColumn("dist",
        when(col("a.pid")===col("b.pid"), lit(0L))
          .otherwise(levenshtein(col("a.prefix"), col("b.prefix"), 5).cast("long")))
      .filter(col("dist") <= 5)
    time("dp_lev_threshold"){ dpLevCap.count() }
    dpLev.explain("formatted")
    spark.stop()
  }
}
