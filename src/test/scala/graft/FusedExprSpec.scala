package graft

import org.apache.spark.sql.functions._
import graft.functions.{FixedSqDistFunctions, Md5WindowsFunctions}

/** The r13 fused codegen expressions against the composable forms they
  * replaced — every value and null case must be bit-identical, because the
  * registry queries they back are oracle-hash-checked on those values.
  *
  *  - [[graft.functions.FixedSqDistExpr]] vs
  *    `aggregate(zip_with(emb, cent, (x,c) -> round((x−c)²·1e12).cast(long)))`
  *  - [[graft.functions.Md5Windows32Expr]] vs
  *    `transform(sequence(0,3), w -> conv(substr(md5(s), w*8+1, 8), 16, 10)
  *       .cast(long))`
  */
class FusedExprSpec extends SparkSpec {
  import spark.implicits._

  FixedSqDistFunctions.register(spark)
  Md5WindowsFunctions.register(spark)

  private def sqDistLambda = aggregate(
    zip_with(col("emb"), col("cent"), (x, cc) =>
      round((x.cast("double") - cc) * (x.cast("double") - cc) * lit(1e12),
        0).cast("long")),
    lit(0L), (acc, v) => acc + v)

  test("fixed_sqdist == composable zip_with/aggregate fold, incl. edge values") {
    val rows = Seq(
      (Array(0.0f, 0.5f, -1.0f), Array(0.0, 0.25, 1.0)),
      (Array(1.0f, 1.0f), Array(1.0, 1.0)),                 // exact zero
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4, 0.5, -0.6)),
      (Array(2.0f), Array(-2.0)),                           // max magnitude
      (Array.empty[Float], Array.empty[Double]),            // empty → 0
      (Array(1e-7f, -1e-7f), Array(0.0, 0.0)),              // sub-ulp terms
      (Array(0.123456f, 0.654321f, 0.9999999f),
        Array(0.123456, 0.654321, 1.0000001)))
      .toDF("emb", "cent")
    val got = rows.select(
      FixedSqDistFunctions.fixedSqDist(col("emb"), col("cent")).as("fused"),
      sqDistLambda.as("lambda")).collect()
    got.foreach(r => assert(r.get(0) == r.get(1), r.toString))
  }

  test("fixed_sqdist length-mismatch and null-input are null, like zip_with") {
    val rows = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0))),          // len mismatch
      (Some(Array(1.0f)), Some(Array(1.0, 2.0))),           // other side
      (None: Option[Array[Float]], Some(Array(1.0))),       // null input
      (Some(Array(1.0f)), None: Option[Array[Double]]))
      .toDF("emb", "cent")
    val got = rows.select(
      FixedSqDistFunctions.fixedSqDist(col("emb"), col("cent")).as("fused"),
      sqDistLambda.as("lambda")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1), r.toString)
    }
  }

  test("fixed_sqdist random fuzz vs lambda (1000 rows, dim 64)") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(1000)((
      Array.fill(64)(rnd.nextFloat() * 4 - 2),
      Array.fill(64)(rnd.nextDouble() * 4 - 2)))
      .toDF("emb", "cent")
    val bad = rows.select(
      FixedSqDistFunctions.fixedSqDist(col("emb"), col("cent")).as("fused"),
      sqDistLambda.as("lambda"))
      .filter(!(col("fused") <=> col("lambda"))).count()
    assert(bad == 0L)
  }

  private def convWindows = transform(sequence(lit(0), lit(3)),
    w => conv(md5(col("s")).substr(w * lit(8) + 1, lit(8)), 16, 10)
      .cast("long"))

  test("md5_windows32 == conv-chain on fixed and fuzzed strings") {
    val rnd = new scala.util.Random(7)
    val fixed = Seq("", "a", "0|1", "12|999999", "pfs|42",
      "é世界|x", "long" * 100)
    val fuzz = Seq.fill(500)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString
      + "|" + rnd.nextLong())
    val rows = (fixed ++ fuzz).toDF("s")
    val bad = rows.select(
      Md5WindowsFunctions.md5Windows32(col("s")).as("fused"),
      convWindows.as("chain"))
      .filter(!(col("fused") <=> col("chain"))).count()
    assert(bad == 0L)
  }

  test("md5_windows32 null propagates") {
    val rows = Seq(Option.empty[String], Some("x")).toDF("s")
    val got = rows.select(
      Md5WindowsFunctions.md5Windows32(col("s")).as("fused")).collect()
    assert(got.exists(_.isNullAt(0)) && got.exists(!_.isNullAt(0)))
  }
}
