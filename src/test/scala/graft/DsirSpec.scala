package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** [[TextOps.dsirSample]] — DSIR importance resampling (Xie et al. 2023).
  * The statistical property under test: documents drawn from the target
  * distribution carry higher importance weights, so the resample enriches
  * for target-like text. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target vocabulary {alpha..delta}, raw vocabulary {zeta..theta}:
  // disjoint token sets make the expected weight ordering unambiguous
  private val docs = {
    val tgtWords = Seq("alpha", "beta", "gamma", "delta")
    val rawWords = Seq("zeta", "eta", "theta", "iota")
    val rows = (0 until 40).map { i =>
      val words = if (i % 2 == 0) tgtWords else rawWords
      val text = (0 until 12).map(j => words((i + j) % 4)).mkString(" ")
      (i.toLong, text, if (i % 2 == 0) "en" else "zz", s"src$i", text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("target-vocabulary documents get strictly higher importance weights") {
    val out = TextOps.dsirSample(docs, col("lang") === "en", 64, 40)
      .select("doc_id", "logw").as[(Long, Double)].collect().toMap
    val tgt = out.filter(_._1 % 2 == 0).values
    val raw = out.filter(_._1 % 2 == 1).values
    assert(tgt.min > raw.max,
      s"every en doc should outweigh every zz doc: en min=${tgt.min} zz max=${raw.max}")
  }

  test("resampling enriches for the target distribution") {
    val top10 = TextOps.dsirSample(docs, col("lang") === "en", 64, 10)
      .select("lang").as[String].collect()
    val enShare = top10.count(_ == "en").toDouble / top10.length
    assert(enShare >= 0.8, s"top-10 should be mostly target-like: $enShare")
  }

  test("deterministic: same seed, same selection") {
    val a = TextOps.dsirSample(docs, col("lang") === "en", 64, 10).collect()
    val b = TextOps.dsirSample(docs, col("lang") === "en", 64, 10).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("registry entry runs on the smoke fixture with ranked output") {
    val rows = SparkEntry.queries("text_dsir_sample")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 40)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 40))
  }
}
