package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: plan audit for the round-5 operators (not part of the contract). */
object DevProbe5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    println("=== text_lm_score ===")
    SparkEntry.queries("text_lm_score")(spark, dir).explain("formatted")
    println("=== dedup_incremental ===")
    SparkEntry.queries("dedup_incremental")(spark, dir).explain("formatted")
    spark.stop()
  }
}
