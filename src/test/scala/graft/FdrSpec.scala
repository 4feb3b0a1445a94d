package graft

import graft.queries.Relational7

/** Benjamini–Hochberg step-up semantics the oracle can't isolate: the
  * step-up rule (a rank whose own flag fails is rejected when a LARGER
  * flagged rank exists), the all-integer threshold compare, ties, and
  * the no-rejection case. p-values are exact fractions p_num/p_den. */
class FdrSpec extends SparkSpec {
  import spark.implicits._

  private def run(ps: Seq[(String, Long)], den: Long = 100L,
                  aNum: Int = 1, aDen: Int = 20) = {
    val df = ps.map { case (t, n) => (t, n, den, 0.0) }
      .toDF("event_type", "p_num", "p_den", "obs_diff")
    Relational7.bhReject(df, aNum, aDen).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("k"), r.getAs[Boolean]("reject"))).toMap
  }

  test("step-up: a middling p is rejected because a larger rank passes") {
    // m=4, α=0.05: thresholds k/m·α = .0125, .025, .0375, .05
    // p = .01, .03, .04, .9 → k=3 flags (.04 ≤ .0375? no) — recompute:
    // p(1)=.01 ≤ .0125 ✓, p(2)=.03 ≤ .025 ✗, p(3)=.04 ≤ .0375 ✗ → K=1
    val r1 = run(Seq("a" -> 1L, "b" -> 3L, "c" -> 4L, "d" -> 90L))
    assert(r1("a") == (1L, true) && r1("b") == (2L, false) &&
      r1("c") == (3L, false) && r1("d") == (4L, false))
    // raise α to 0.2: thresholds .05/.1/.15/.2 → p(3)=.04 ≤ .15 ✓ → K=3
    // rejects a AND b (whose own flag .03 ≤ .1 ✓) AND c — including any
    // rank below K regardless of its own flag
    val r2 = run(Seq("a" -> 1L, "b" -> 3L, "c" -> 4L, "d" -> 90L),
      aNum = 1, aDen = 5)
    assert(r2("a")._2 && r2("b")._2 && r2("c")._2 && !r2("d")._2)
  }

  test("boundary is inclusive and exact in integers") {
    // m=2, α=0.05: k=2 threshold is exactly 0.05 = 5/100 — the integer
    // compare p_num·m·20 ≤ k·p_den must accept equality (5·2·20 = 200 =
    // 2·100·1), where a float 0.05000000000000001 would flip it
    val r = run(Seq("a" -> 5L, "b" -> 5L))
    assert(r("a")._2 && r("b")._2)
    // one notch above the k=2 boundary fails, and rank 1 alone cannot
    // pass its own tighter 0.025 threshold → nothing rejected
    val r2 = run(Seq("a" -> 5L, "b" -> 6L))
    assert(!r2("a")._2 && !r2("b")._2)
  }

  test("tied p-values rank by type name and reject together or not at all") {
    val r = run(Seq("x" -> 2L, "y" -> 2L, "z" -> 2L), aDen = 20)
    // m=3, α=.05: thresholds .0167/.033/.05; p=.02 each: k=3 flag
    // .02 ≤ .05 ✓ → all rejected
    assert(Seq("x", "y", "z").forall(r(_)._2))
    assert(r("x")._1 == 1L && r("y")._1 == 2L && r("z")._1 == 3L)
  }

  test("nothing rejected when no rank passes") {
    val r = run(Seq("a" -> 50L, "b" -> 60L, "c" -> 70L))
    assert(r.values.forall(!_._2))
  }
}
