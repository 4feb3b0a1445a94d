package graft

import graft.queries.Relational7

/** Winnowing (SIGMOD'03) selection properties the oracle can't isolate:
  * the coverage guarantee (≥1 fingerprint per window of w consecutive
  * k-grams), the match guarantee (a shared token run of ≥ w+k−1 shares a
  * selected fingerprint), the rightmost-on-tie rule, and partition
  * invariance of the rolling-min selection. k=3, w=4 as shipped. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fps(docs: Seq[(Long, String)]) =
    Relational7.winnowedFrom(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("coverage: every window of 4 consecutive k-grams holds a selection") {
    val text = (1 to 40).map(i => s"tok${i % 13}").mkString(" ")
    val sel = fps(Seq((1L, text))).map(_._3).sorted // fp_pos values
    val nGrams = 40 - 2
    // every window [p-3, p] for p in 3..nGrams-1 must contain a position
    (3 until nGrams).foreach { p =>
      assert(sel.exists(q => q >= p - 3 && q <= p),
        s"window ending at $p uncovered: ${sel.mkString(",")}")
    }
  }

  test("match guarantee: a shared 6-token run yields a shared fingerprint") {
    // w+k-1 = 6: plant the same 6-token run inside different contexts
    val run = "alpha beta gamma delta epsilon zeta"
    val a = s"one two three four $run five six seven eight"
    val b = s"x1 x2 $run x3 x4 x5 x6 x7 x8"
    val out = fps(Seq((1L, a), (2L, b)))
    val ha = out.filter(_._1 == 1L).map(_._2).toSet
    val hb = out.filter(_._1 == 2L).map(_._2).toSet
    assert((ha & hb).nonEmpty, s"no shared fingerprint: $ha vs $hb")
  }

  test("tie rule: identical hashes in a window select the rightmost") {
    // every k-gram identical -> every window is an all-tie; robust
    // winnowing picks the rightmost, i.e. each window's own end position,
    // so ALL positions >= 0 get selected exactly once each
    val text = Seq.fill(10)("same").mkString(" ")
    val sel = fps(Seq((1L, text))).map(_._3).sorted
    assert(sel.toSeq == (3L until 8L), s"got ${sel.mkString(",")}")
  }

  test("selection is partition-invariant and short docs yield nothing") {
    val docs = (0L until 20L).map(i =>
      (i, (1 to 30).map(j => s"w${(i * 7 + j * 3) % 11}").mkString(" ")))
    val one = Relational7.winnowedFrom(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val two = Relational7.winnowedFrom(
      docs.toDF("doc_id", "text").repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(one == two)
    assert(fps(Seq((9L, "a b"))).isEmpty) // < k tokens -> no k-grams
  }
}
