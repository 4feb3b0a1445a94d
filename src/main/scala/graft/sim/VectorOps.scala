package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over an embedding column (`array<float>`).
  *
  * Exact path: positional explode + equi-join on the dimension index +
  * decimal-exact dot products — bit-identical to the DuckDB oracle and
  * fully shuffle-parallel (the join key is (pair, dim), never a single
  * partition).
  *
  * Scale path: random-hyperplane LSH — each vector gets a b-bit sign
  * bucket from deterministic pseudo-planes; candidates share a bucket, and
  * only candidates are reranked exactly. At 100 TB the bucket join replaces
  * the all-pairs product: cost goes from O(N²·d) to O(N·d + collisions).
  */
object VectorOps {

  private def dsum12(c: Column): Column =
    sum(c.cast(DecimalType(38, 12))).cast("double")

  /** (vec_id, label, i, x) positional explode; x widened to double. */
  def unnested(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
      posexplode(col("embedding")).as(Seq("i", "x")))
      .withColumn("x", col("x").cast("double"))

  /** Per-vector L2 norms (decimal-exact sum of squares). */
  def norms(v: DataFrame): DataFrame =
    v.groupBy("vec_id").agg(sqrt(dsum12(col("x") * col("x"))).as("nrm"))

  /** Exact cosine of every vector vs the `queryId` vector, top-k.
    * Brute force — the correctness baseline. */
  def cosineTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val v = unnested(emb)
    val q = v.filter(col("vec_id") === queryId)
      .select(col("i"), col("x").as("qx"))
    val dots = v.join(q, "i")
      .groupBy("vec_id")
      .agg(dsum12(col("x") * col("qx")).as("dot"))
    val n = norms(v)
    val qn = n.filter(col("vec_id") === queryId).select(col("nrm").as("qnrm"))
    dots.join(n, "vec_id").crossJoin(broadcast(qn))
      .select(col("vec_id"),
        round(col("dot") / (col("nrm") * col("qnrm")), 6).as("cosine"))
      .orderBy(desc("cosine"), col("vec_id"))
      .limit(k)
  }

  /** All same-label pairs with cosine ≥ threshold (embedding near-dup).
    * The label acts as the blocking key — at scale, replace with LSH
    * buckets ([[lshBuckets]]) to bound pair growth. */
  def cosinePairs(emb: DataFrame, threshold: Double): DataFrame = {
    val v = unnested(emb)
    val a = v.as("a"); val b = v.as("b")
    val dots = a.join(b,
        col("a.i") === col("b.i") && col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id"))
      .groupBy(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
      .agg(dsum12(col("a.x") * col("b.x")).as("dot"))
    val n = norms(v)
    dots
      .join(n.select(col("vec_id").as("v1"), col("nrm").as("n1")), "v1")
      .join(n.select(col("vec_id").as("v2"), col("nrm").as("n2")), "v2")
      .select(col("v1"), col("v2"),
        round(col("dot") / (col("n1") * col("n2")), 6).as("cosine"))
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

  /** b-bit sign bucket per vector under [[LshPlanes]] random hyperplanes. */
  def lshBuckets(emb: DataFrame, planes: Int = LshPlanes): DataFrame = {
    val v = unnested(emb)
    val projAggs = (0 until planes).map(p =>
      sum(col("x") * planeComponent(p, col("i"))).as(s"proj$p"))
    val bits = (0 until planes).map(p => when(col(s"proj$p") >= 0, "1").otherwise("0"))
    v.groupBy("vec_id").agg(projAggs.head, projAggs.tail: _*)
      .select(col("vec_id"), concat(bits: _*).as("bucket"))
  }

  /** ANN top-k: restrict candidates to vectors whose LSH bucket is within
    * `maxHamming` bits of the query's bucket, then rerank exactly. With
    * maxHamming = 0 this is a pure bucket-equality join (the 100 TB path);
    * small positive values trade cost for recall. */
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
