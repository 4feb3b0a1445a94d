package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Dot products are computed *inline over the array* (zip_with + aggregate)
  * in fixed-point: each product is rounded to 12 decimals and accumulated as
  * a long. Long addition is associative, so the result is independent of
  * evaluation order and bit-identical to the DuckDB oracle's
  * `SUM(CAST(ROUND(x*y*1e12, 0) AS BIGINT))` — while staying on the fast
  * primitive path (no BigDecimal, no explode, no per-dimension shuffle).
  * With |x| ≤ 1 and 64 dims the accumulator stays ≤ ~1e14 ≪ 2^63.
  *
  * Scale posture: the exact pair pass joins on a blocking key (label here;
  * LSH buckets at 100 TB) carrying the arrays — one shuffle, no
  * (pair × dimension) row explosion. ANN path: random-hyperplane LSH
  * buckets → hamming-probe candidates → exact rerank, O(N·d + collisions)
  * instead of O(N²·d).
  */
object VectorOps {

  private val Scale = 1e12

  /** Fixed-point dot product of two float arrays, as a long (×1e12) — the
    * fused codegen'd [[graft.functions.FixedDotExpr]]; the equivalent
    * composable form `aggregate(zip_with(a, b, (x,y) => round(x·y·1e12)))`
    * computes the identical value ~3× slower (interpreted HOFs + an
    * intermediate array per row). */
  def fixedDot(a: Column, b: Column): Column =
    graft.functions.FixedDotFunctions.fixedDot(a, b)

  /** L2 norm from the fixed-point self-dot. */
  def norm(e: Column): Column =
    sqrt(fixedDot(e, e).cast("double") / Scale)

  // raw double chain — long-dot ÷ 1e12 ÷ (sqrt·sqrt product) is the same
  // IEEE op sequence in both engines (sqrt is correctly rounded by IEEE
  // 754), so the value is bit-identical without rounding; ROUND itself
  // diverges between engines at exact .5·10⁻ⁿ boundaries
  private def cosine(ea: Column, eb: Column, na: Column, nb: Column): Column =
    (fixedDot(ea, eb).cast("double") / Scale) / (na * nb)

  /** Exact cosine of every vector vs the `queryId` vector, top-k. The query
    * vector is a 1-row broadcast; one scan, no shuffle before the top-k. */
  def cosineTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    graft.functions.FixedDotFunctions.register(emb.sparkSession)
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qemb"))
    emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        cosine(col("embedding"), col("qemb"),
          norm(col("embedding")), norm(col("qemb"))).as("cosine"))
      .orderBy(desc("cosine"), col("vec_id"))
      .limit(k)
  }

  /** All same-label pairs with cosine ≥ threshold (embedding near-dup).
    * The label is the blocking key — at scale, substitute LSH buckets
    * ([[lshBuckets]]) to bound pair growth. */
  def cosinePairs(emb: DataFrame, threshold: Double): DataFrame = {
    graft.functions.FixedDotFunctions.register(emb.sparkSession)
    val withNorm = emb.select(col("vec_id"), col("label"),
      col("embedding"), norm(col("embedding")).as("nrm"))
    val a = withNorm.select(col("label"), col("vec_id").as("v1"),
      col("embedding").as("ea"), col("nrm").as("n1"))
    val b = withNorm.select(col("label"), col("vec_id").as("v2"),
      col("embedding").as("eb"), col("nrm").as("n2"))
    a.join(b, "label")
      .filter(col("v1") < col("v2"))
      .select(col("v1"), col("v2"),
        cosine(col("ea"), col("eb"), col("n1"), col("n2")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("v1", "v2")
  }

  // 8 planes: for a cosine-0.5 neighbor (angle 60°, per-plane agreement
  // ≈ 2/3) expected bucket hamming is ~2.7, so the hamming-≤3 probe keeps
  // ~70% recall while pruning ~2/3 of candidates; tighter budgets only pay
  // off when true neighbors are close (cosine ≥ 0.9).
  val LshPlanes = 8

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * md5("p|i") → first 6 hex digits → uniform in [-1, 1). Pure column
    * expression, reproducible on any engine. */
  private def planeComponent(p: Int, i: Column): Column =
    (conv(substring(md5(concat(lit(s"$p|"), i.cast("string"))), 1, 6), 16, 10)
      .cast("double") / lit(0xffffff.toDouble)) * 2.0 - 1.0

  /** b-bit sign bucket per vector under [[LshPlanes]] random hyperplanes —
    * computed inline over the array (projection = aggregate over the dim
    * sequence), no explode, no shuffle. */
  def lshBuckets(emb: DataFrame, planes: Int = LshPlanes): DataFrame = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, "1").otherwise("0")
    }
    emb.select(col("vec_id"), concat(bits: _*).as("bucket"))
  }

  // ------------------------------------------------------------------ IVF
  /** IVF coarse quantizer: the first `k` vec_ids serve as deterministic
    * seed centroids (at scale: a k-means refinement over a sample — the
    * assignment machinery is identical). Centroids are broadcast; every
    * vector is assigned to its max-cosine cell in one scan. */
  def ivfAssign(emb: DataFrame, nCells: Int): DataFrame = {
    graft.functions.FixedDotFunctions.register(emb.sparkSession)
    val centroids = emb.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cemb"),
        norm(col("embedding")).as("cnrm"))
    val scored = emb.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("cell"),
        cosine(col("embedding"), col("cemb"), norm(col("embedding")),
          col("cnrm")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("cos"), col("cell"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "cell")
  }

  /** IVF ANN top-k: probe the `nprobe` cells whose centroids are closest to
    * the query, rerank exactly inside them. Candidate cost ≈ nprobe/nCells
    * of the corpus instead of all of it. */
  def ivfTopK(emb: DataFrame, queryId: Long, k: Int, nCells: Int = 16,
              nprobe: Int = 4): DataFrame = {
    val assign = ivfAssign(emb, nCells)
    val qemb = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"))
    val centroids = emb.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cemb"),
        norm(col("embedding")).as("cnrm"))
    val probeCells = centroids.crossJoin(broadcast(qemb))
      .select(col("cell"),
        cosine(col("cemb"), col("qe"), col("cnrm"), norm(col("qe"))).as("cos"))
      .orderBy(desc("cos"), col("cell")).limit(nprobe)
      .select("cell")
    val candidates = assign.join(broadcast(probeCells), "cell").select("vec_id")
      // the query itself must stay a candidate even if its cell isn't probed
      .union(emb.filter(col("vec_id") === queryId).select("vec_id"))
      .distinct()
    cosineTopK(emb.join(candidates, Seq("vec_id"), "left_semi"), queryId, k)
  }

  /** ANN top-k: candidates are vectors whose LSH bucket is within
    * `maxHamming` bits of the query's, reranked exactly. maxHamming = 0 is
    * a pure bucket-equality join (the 100 TB path); small positive values
    * trade cost for recall. */
  def annTopK(emb: DataFrame, queryId: Long, k: Int,
              maxHamming: Int = 3): DataFrame = {
    val buckets = lshBuckets(emb)
    val qb = buckets.filter(col("vec_id") === queryId)
      .select(col("bucket").as("qbucket"))
    val hamming = {
      val diffs = (1 to LshPlanes).map(j =>
        when(substring(col("bucket"), j, 1) =!= substring(col("qbucket"), j, 1), 1)
          .otherwise(0))
      diffs.reduce(_ + _)
    }
    val candidates = buckets.crossJoin(broadcast(qb))
      .filter(hamming <= maxHamming)
      .select("vec_id")
    cosineTopK(emb.join(candidates, Seq("vec_id"), "left_semi"), queryId, k)
  }
}
