package graft

import org.apache.spark.sql.functions._
import graft.sim.VectorOps

/** [[VectorOps.semDedup]] on a hand-computable fixture: two well-separated
  * clusters, exact duplicates and a near-duplicate inside them, plus a
  * vector whose LABEL disagrees with its geometry (the case that
  * distinguishes SemDeDup's centroid blocking from label blocking). */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // label 0 centered at (1, 0); label 1 centered at (0, 1).
  // v10/v11 duplicates, v12 near-dup (cos > 0.999), v13 orthogonal-ish;
  // v20/v21 duplicates; v22 carries label 0 but sits in cluster 1.
  private val fixture = Seq(
    (10L, 0, Array(1.0f, 0.00f)),
    (11L, 0, Array(1.0f, 0.00f)),     // dup of 10 -> pruned
    (12L, 0, Array(0.99f, 0.02f)),    // near-dup of 10 -> pruned
    (13L, 0, Array(0.60f, -0.80f)),   // far from 10 in angle -> kept
    (20L, 1, Array(0.0f, 1.00f)),
    (21L, 1, Array(0.0f, 1.00f)),     // dup of 20 -> pruned
    (22L, 0, Array(0.05f, 0.98f)))    // label 0, geometry cluster 1 -> pruned vs 20
    .toDF("vec_id", "label", "embedding")

  private def cents = VectorOps.centroids(fixture)
    .select("label", "dim", "centroid_x").collect()
    .groupBy(_.getInt(0))
    .map { case (l, rows) => l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    .toSeq.sortBy(_._1)

  test("semDedup prunes within geometric clusters with lowest-id survivor") {
    // threshold 0.95: inside cluster 0 only (10,11) and (10,12)/(11,12)
    // qualify; 13 survives. Cluster 1 gains 22 (geometry wins over label),
    // and 20/21/22 are mutual near-dups -> only 20 survives.
    val out = VectorOps.semDedup(fixture, cents, 0.95)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // centroid 0 = mean of labeled-0 vectors (pulled by 13 and 22), but
    // geometry still sends 22 to cluster 1: verify by assignment
    val assigned = VectorOps.assignToCentroids(fixture, cents)
      .select("vec_id", "assigned_label").as[(Long, Int)].collect().toMap
    assert(assigned(22L) == 1, "label-0 vector in cluster-1 geometry")
    val m = out.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m(0) == ((4L, 2L, 2L)), s"cluster 0: $m") // 10,13 kept; 11,12 pruned
    assert(m(1) == ((3L, 2L, 1L)), s"cluster 1: $m") // 20 kept; 21,22 pruned
  }

  test("n_kept + n_pruned == n_vecs and totals cover the corpus") {
    val out = VectorOps.semDedup(fixture, cents, 0.95).collect()
    assert(out.forall(r => r.getLong(1) == r.getLong(2) + r.getLong(3)))
    assert(out.map(_.getLong(1)).sum == 7L)
  }

  test("threshold 1.0-epsilon keeps near-dups, prunes only exact dups") {
    val out = VectorOps.semDedup(fixture, cents, 0.99999)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(out(0) == 1L, "only the exact duplicate 11 pruned in cluster 0")
    assert(out(1) == 1L, "only the exact duplicate 21 pruned in cluster 1")
  }

  test("incremental: batch pruned against corpus and within itself") {
    // corpus holds v10 (cluster 0) and v20 (cluster 1); the batch brings
    // a corpus-dup (11 ~ 10), an internal dup pair (23, 24), and a
    // genuinely new direction (13)
    val corpus = Seq(
      (10L, 0, Array(1.0f, 0.0f)),
      (20L, 1, Array(0.0f, 1.0f))).toDF("vec_id", "label", "embedding")
    val batch = Seq(
      (11L, 0, Array(1.0f, 0.0f)),    // dup of corpus 10 -> by_corpus
      (13L, 0, Array(0.6f, -0.8f)),   // new -> keep
      (23L, 1, Array(0.0f, 1.0f)),    // dup of corpus 20 AND of 24
      (24L, 1, Array(0.0f, 1.0f))).toDF("vec_id", "label", "embedding")
    val cents = VectorOps.centroids(corpus)
      .select("label", "dim", "centroid_x").collect()
      .groupBy(_.getInt(0))
      .map { case (l, r) => l -> r.sortBy(_.getInt(1)).map(_.getDouble(2)) }
      .toSeq.sortBy(_._1)
    val out = VectorOps.semDedupIncremental(corpus, batch, cents, 0.95)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(out(11L) == ((true, false, false)))
    assert(out(13L) == ((false, false, true)))
    assert(out(23L) == ((true, false, false)), "23 < 24, so no in-batch flag")
    assert(out(24L) == ((true, true, false)))
  }

  test("registry entry runs on the smoke fixture and is internally consistent") {
    val df = SparkEntry.queries("sim_semdedup")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) == r.getLong(2) + r.getLong(3)))
  }

  // -------------------------------------------------- hot-cluster cap

  /** One artificially giant cluster: n vectors fanning through distinct
    * angles (distinct plane-0 projections), plus planted exact-duplicate
    * pairs at ids far apart — the skew shape a dedup corpus concentrates
    * into a single k-means cell. */
  private def giantCluster(n: Int): org.apache.spark.sql.DataFrame = {
    val base = (0 until n).map { i =>
      val theta = 0.3 + 0.9 * i.toDouble / n // one quadrant, same cell
      (i.toLong, 0, Array(math.cos(theta).toFloat, math.sin(theta).toFloat))
    }
    // duplicates of rows 7, 120, 280 planted at high ids: identical
    // vectors => identical projections => rank-adjacent under the cap
    val dups = Seq(7, 120, 280).zipWithIndex.map { case (src, j) =>
      (1000L + j, 0, base(src)._3.clone())
    }
    (base ++ dups).toDF("vec_id", "label", "embedding")
  }

  test("hot-cluster cap bounds pair work to O(n·cap), not O(n²)") {
    val n = 303 // 300 fan + 3 dups, all one block
    val emb = giantCluster(300)
    val cap = 32
    // threshold -1 accepts every evaluated pair => the row count IS the
    // number of candidate pairs the plan evaluated
    val capped = VectorOps.cosinePairsBy(emb, -1.0, "label", cap).count()
    val allPairs = n.toLong * (n - 1) / 2 // 45_753
    // two staggered passes, bands of `cap`: <= 2 * ceil(n/cap) * C(cap,2)
    val bound = 2L * ((n + cap - 1) / cap) * cap * (cap - 1) / 2
    assert(capped <= bound, s"capped=$capped bound=$bound")
    assert(capped < allPairs / 4, s"capped=$capped not ≪ allPairs=$allPairs")
    assert(capped > 0)
  }

  test("hot-cluster cap still finds planted near-duplicates (sorted neighborhood)") {
    val emb = giantCluster(300)
    val found = VectorOps.cosinePairsBy(emb, 0.999999, "label", 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical vectors sort adjacently on (projection, vec_id)
    assert(found.contains((7L, 1000L)), s"missing (7,1000) in $found")
    assert(found.contains((120L, 1001L)), s"missing (120,1001) in $found")
    assert(found.contains((280L, 1002L)), s"missing (280,1002) in $found")
  }

  test("cap not engaged == exhaustive results byte-for-byte") {
    // fixture blocks are tiny; default cap and an effectively-infinite cap
    // must produce identical pairs AND identical semDedup aggregates
    val withCap = VectorOps.cosinePairsBy(fixture, 0.95, "label").collect()
    val noCap = VectorOps.cosinePairsBy(fixture, 0.95, "label",
      Int.MaxValue).collect()
    assert(withCap.toSeq == noCap.toSeq)
  }

  test("large-k centroid assignment: broadcast-join form == expression-form semantics") {
    // k = 80 > CentroidExprMax engages the join form (the sf10 finding:
    // the expression form's plan is O(k·dim) literal text and generated a
    // 33 MiB task binary at k ≈ 3000); the fixed-point argmin must be
    // identical to a driver-side brute recompute of the SAME formula
    val k = 80
    val dim = 4
    val cents: Seq[(Int, Array[Double])] = (0 until k).map { l =>
      (l, Array.tabulate(dim)(d => math.sin(l * 1.7 + d) * 0.9))
    }
    val vecs = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(dim)(d => (math.cos(i * 0.31 + d) * 0.9).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    assert(k > VectorOps.CentroidExprMax)
    val got = VectorOps.assignToCentroids(emb, cents)
      .select("vec_id", "assigned_label").as[(Long, Int)].collect().toMap
    def brute(v: Array[Float]): Int = cents.map { case (l, c) =>
      val dist = v.zip(c).map { case (x, cc) =>
        math.rint((x.toDouble - cc) * (x.toDouble - cc) * 1e12).toLong }.sum
      (dist, l)
    }.min._2
    vecs.foreach { case (id, v) =>
      assert(got(id) == brute(v), s"vec $id: got ${got(id)} want ${brute(v)}")
    }
    // and the small-k expression form agrees with the same brute formula
    // on its own codebook prefix
    val smallCents = cents.take(8)
    val gotSmall = VectorOps.assignToCentroids(emb, smallCents)
      .select("vec_id", "assigned_label").as[(Long, Int)].collect().toMap
    def bruteSmall(v: Array[Float]): Int = smallCents.map { case (l, c) =>
      (v.zip(c).map { case (x, cc) =>
        math.rint((x.toDouble - cc) * (x.toDouble - cc) * 1e12).toLong }.sum, l)
    }.min._2
    vecs.foreach { case (id, v) => assert(gotSmall(id) == bruteSmall(v)) }
  }

  test("large-k assignment labels every row independently (dup/null vec_id)") {
    // the join form scores on a GENERATED row id (round-11 ADVICE fix):
    // two rows SHARING a vec_id but holding different embeddings must get
    // their own nearest labels (pre-fix they coalesced onto one label via
    // the groupBy+rejoin), and a NULL vec_id row must survive (pre-fix the
    // inner rejoin dropped it) — exactly the expression form's semantics
    val k = 80
    val dim = 4
    val cents: Seq[(Int, Array[Double])] = (0 until k).map { l =>
      (l, Array.tabulate(dim)(d => math.sin(l * 1.7 + d) * 0.9))
    }
    def brute(v: Array[Float]): Int = cents.map { case (l, c) =>
      (v.zip(c).map { case (x, cc) =>
        math.rint((x.toDouble - cc) * (x.toDouble - cc) * 1e12).toLong }.sum, l)
    }.min._2
    val rows = Seq(
      (java.lang.Long.valueOf(1L), Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (java.lang.Long.valueOf(1L), Array(-0.9f, 0.0f, 0.7f, 0.0f)),
      (null.asInstanceOf[java.lang.Long], Array(0.0f, 0.9f, -0.5f, 0.2f)))
    val emb = rows.toDF("vec_id", "embedding")
    val got = VectorOps.assignToCentroids(emb, cents)
      .select("embedding", "assigned_label").collect()
      .map(r => (r.getSeq[Float](0).toArray, r.getInt(1)))
    assert(got.length == 3, "every input row must survive, null vec_id too")
    got.foreach { case (v, lbl) =>
      assert(lbl == brute(v), s"${v.toSeq}: got $lbl want ${brute(v)}")
    }
  }

  test("large-k silhouette: join form matches a driver-side recompute") {
    val k = 70 // > CentroidExprMax
    val dim = 3
    import scala.util.Random
    val rng = new Random(11)
    val vecs = (0 until k).flatMap { l =>
      val c = Array.tabulate(dim)(d => math.sin(l * 2.3 + d))
      (0 until 3).map { j =>
        (l * 10L + j, l,
          c.map(x => (x + rng.nextGaussian() * 0.01).toFloat))
      }
    }
    val emb = vecs.toDF("vec_id", "label", "embedding")
    val got = VectorOps.silhouette(emb).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    // driver-side recompute with the identical fixed-point + IEEE steps
    val cents = vecs.groupBy(_._2).map { case (l, rows) =>
      l -> Array.tabulate(dim)(d =>
        rows.map(r => r._3(d).toDouble).sum / rows.size)
    }
    def dist(v: Array[Float], c: Array[Double]): Double =
      math.sqrt(v.zip(c).map { case (x, cc) =>
        math.rint((x.toDouble - cc) * (x.toDouble - cc) * 1e12).toLong
      }.sum.toDouble / 1e12)
    val sByLabel = vecs.groupBy(_._2).map { case (l, rows) =>
      val ss = rows.map { case (_, lbl, v) =>
        val a = dist(v, cents(lbl))
        val b = cents.filter(_._1 != lbl).map(c => dist(v, c._2)).min
        if (math.max(a, b) == 0.0) 0.0 else (b - a) / math.max(a, b)
      }
      l -> (ss.map(s => BigDecimal(s).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum / rows.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    sByLabel.foreach { case (l, want) =>
      assert(math.abs(got(l) - want) < 1e-6, s"label $l: got ${got(l)} want $want")
    }
  }

  test("duplicated codebook (k=600, 200 distinct) == brute argmin") {
    // k = 600 labels over 200 distinct positions: dedup routes this to
    // the join tier (dk = 200 ≤ CentroidJoinMax) and the duplicate
    // expansion must keep the fixed-point argmin — including (dist, lbl)
    // tie-breaks across the planted duplicate centroids — bit-identical
    // to a driver-side brute recompute over the FULL codebook.
    val k = 600
    val dim = 8
    val cents: Seq[(Int, Array[Double])] = (0 until k).map { l =>
      // duplicate centroid positions every 200 labels: exact ties must
      // resolve to the LOWEST label, exactly as the join/expression forms
      (l, Array.tabulate(dim)(d => math.sin((l % 200) * 1.7 + d) * 0.9))
    }
    assert(k > VectorOps.CentroidJoinMax &&
      cents.map(_._2.toSeq).distinct.size <= VectorOps.CentroidJoinMax)
    val vecs = (0 until 400).map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        (math.cos(i * 0.31 + d * 1.3) * 0.9).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val got = VectorOps.assignToCentroids(emb, cents)
      .select("vec_id", "assigned_label").as[(Long, Int)].collect().toMap
    def brute(v: Array[Float]): Int = cents.map { case (l, c) =>
      (v.zip(c).map { case (x, cc) =>
        math.rint((x.toDouble - cc) * (x.toDouble - cc) * 1e12).toLong }.sum,
        l)
    }.min._2
    vecs.foreach { case (id, v) =>
      assert(got(id) == brute(v), s"vec $id: got ${got(id)} want ${brute(v)}")
    }
  }

  test("replicated-fixture regime: 30 positions × 40 copies == brute") {
    // the sf100 shape: k = 1200 labels over 30 DISTINCT positions (the
    // make_sf fixtures shift labels but keep vectors, so every label mean
    // replicates verbatim). Dedup must route this to the single-projection
    // form and the l2 expansion must reproduce brute top-2 ties exactly.
    val dim = 8
    val positions = (0 until 30).map { p =>
      Array.tabulate(dim)(d => math.sin(p * 1.9 + d) * 0.8)
    }
    val cents: Seq[(Int, Array[Double])] = (0 until 1200).map { l =>
      (l, positions(l % 30))
    }
    val vecs = (0 until 250).map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        (math.cos(i * 0.37 + d * 0.7) * 0.85).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val nt = VectorOps.nearestTwoPruned(emb, cents)
      .select(col("vec_id"), col("__b1.dist"), col("__b1.lbl"),
        col("__b2.dist"), col("__b2.lbl"))
      .as[(Long, Long, Int, Long, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    def top2(v: Array[Float]): ((Long, Int), (Long, Int)) = {
      val scored = cents.map { case (l, c) =>
        (v.zip(c).map { case (x, cc) =>
          math.rint((x.toDouble - cc) * (x.toDouble - cc) * 1e12).toLong
        }.sum, l)
      }.sorted
      (scored(0), scored(1))
    }
    vecs.foreach { case (id, v) =>
      val ((d1, l1), (d2, l2)) = top2(v)
      // every nearest position is duplicated ×40, so brute b2 is always
      // the SAME distance with the next label — the expansion path
      assert(d1 == d2 && l2 == l1 + 30, s"fixture geometry broke: $id")
      assert(nt(id) == ((d1, l1, d2, l2)),
        s"vec $id: got ${nt(id)} want ${(d1, l1, d2, l2)}")
    }
  }

  test("IVF-pruned top-2 == brute top-2 (the silhouette b-path)") {
    val k = 600
    val dim = 6
    val rng = new scala.util.Random(7)
    // fully DISTINCT random positions: dedup is a no-op and dk = 600
    // > CentroidJoinMax engages the real triangle-inequality branch
    val cents: Seq[(Int, Array[Double])] = (0 until k).map { l =>
      (l, Array.fill(dim)(rng.nextDouble() * 2 - 1))
    }
    val vecs = (0 until 300).map { i =>
      (i.toLong, i % k, Array.fill(dim)((rng.nextDouble() * 2 - 1).toFloat))
    }
    val emb = vecs.toDF("vec_id", "label", "embedding")
    val nt = VectorOps.nearestTwoPruned(emb, cents)
      .select(col("vec_id"), col("__b1.dist"), col("__b1.lbl"),
        col("__b2.dist"), col("__b2.lbl"))
      .as[(Long, Long, Int, Long, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    def top2(v: Array[Float]): ((Long, Int), (Long, Int)) = {
      val scored = cents.map { case (l, c) =>
        (v.zip(c).map { case (x, cc) =>
          math.rint((x.toDouble - cc) * (x.toDouble - cc) * 1e12).toLong
        }.sum, l)
      }.sorted
      (scored(0), scored(1))
    }
    vecs.foreach { case (id, _, v) =>
      val ((d1, l1), (d2, l2)) = top2(v)
      assert(nt(id) == ((d1, l1, d2, l2)),
        s"vec $id: got ${nt(id)} want ${(d1, l1, d2, l2)}")
    }
  }

  test("large-k silhouette via pruned top-2 matches driver recompute") {
    val k = 520 // > CentroidJoinMax
    val dim = 4
    val rng = new scala.util.Random(13)
    val vecs = (0 until k).flatMap { l =>
      val c = Array.tabulate(dim)(d => math.sin(l * 2.3 + d))
      (0 until 2).map { j =>
        (l * 10L + j, l, c.map(x => (x + rng.nextGaussian() * 0.01).toFloat))
      }
    }
    val emb = vecs.toDF("vec_id", "label", "embedding")
    val got = VectorOps.silhouette(emb).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    // engine-exact recompute: fixed-point centroid means, fixed-point
    // distances, decimal-exact label means
    val cents = vecs.groupBy(_._2).map { case (l, rows) =>
      l -> Array.tabulate(dim) { d =>
        rows.map(r => math.rint(r._3(d).toDouble * 1e12).toLong).sum
          .toDouble / 1e12 / rows.size
      }
    }
    def dist(v: Array[Float], c: Array[Double]): Double =
      math.sqrt(v.zip(c).map { case (x, cc) =>
        math.rint((x.toDouble - cc) * (x.toDouble - cc) * 1e12).toLong
      }.sum.toDouble / 1e12)
    val sByLabel = vecs.groupBy(_._2).map { case (l, rows) =>
      val ss = rows.map { case (_, lbl, v) =>
        val a = dist(v, cents(lbl))
        val b = cents.filter(_._1 != lbl).map(c => dist(v, c._2)).min
        if (math.max(a, b) == 0.0) 0.0 else (b - a) / math.max(a, b)
      }
      l -> (ss.map(s => BigDecimal(s).setScale(12,
        BigDecimal.RoundingMode.HALF_UP)).sum / rows.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    sByLabel.foreach { case (l, want) =>
      assert(math.abs(got(l) - want) < 1e-6,
        s"label $l: got ${got(l)} want $want")
    }
  }

  test("mixed sizes: small blocks stay exact while the hot block is banded") {
    // block 0: hot (engages the cap); block 1: 3 rows (exact path)
    val hot = giantCluster(300)
    val small = Seq(
      (5000L, 1, Array(0.0f, 1.0f)),
      (5001L, 1, Array(0.0f, 1.0f)),      // dup -> must be found exactly
      (5002L, 1, Array(-0.8f, 0.6f))).toDF("vec_id", "label", "embedding")
    val pairs = VectorOps.cosinePairsBy(hot.unionByName(small), 0.999999,
      "label", 32).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((5000L, 5001L)), "exact path lost the small-block dup")
    assert(pairs.contains((7L, 1000L)), "banded path lost the hot-block dup")
    assert(!pairs.exists(p => p._1 >= 5000L ^ p._2 >= 5000L),
      "pairs must never cross blocks")
  }

  // ------------------------------------------- hot LSH-bucket cap (r12)

  /** One LSH bucket holding `n` copies of the same vector (identical
    * vectors hash to identical buckets under ANY plane set, so this is
    * plane-agnostic) — the hot-bucket shape the fixed 8-plane grid is
    * guaranteed to produce once bucket occupancy outgrows the cap. */
  private def hotBucket(n: Int) =
    (0 until n).map(i => (i.toLong, 0, Array(0.6f, 0.8f)))
      .toDF("vec_id", "label", "embedding")

  test("LSH hot-bucket cap: capped pairs are a subset, recall on rank-adjacent dups") {
    val emb = hotBucket(30)
    val cap = 4
    val capped = VectorOps.cosinePairsLsh(emb, 0.999999, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = VectorOps.cosinePairsLsh(emb, 0.999999, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped), "cap must never invent pairs")
    assert(uncapped.size == 30 * 29 / 2)
    // identical vectors share a projection, so rank order is vec_id order
    // and every consecutive-id pair shares a band in one of the two passes
    (0 until 29).foreach { i =>
      assert(capped.contains((i.toLong, i + 1L)),
        s"adjacent dup pair ($i,${i + 1}) lost by the banded path")
    }
    // pair work is O(n·cap), not O(n²): with threshold accepting all,
    // the output count IS the evaluated candidate count
    val evaluated = VectorOps.cosinePairsLsh(emb, -1.0, cap).count()
    val bound = 2L * ((30 + cap - 1) / cap) * cap * (cap - 1) / 2
    assert(evaluated <= bound, s"evaluated=$evaluated bound=$bound")
  }

  test("LSH cap not engaged == exhaustive in-bucket pairs byte-for-byte") {
    // the registry fixture's buckets sit far under the default cap, so
    // the default-cap result must equal the effectively-uncapped one
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val withCap = VectorOps.cosinePairsLsh(emb, 0.8).collect()
    val noCap = VectorOps.cosinePairsLsh(emb, 0.8, Int.MaxValue).collect()
    assert(withCap.toSeq == noCap.toSeq)
  }
}
