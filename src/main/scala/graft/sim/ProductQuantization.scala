package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization — the memory-bound scale path for embedding search.
  *
  * At 100 TB an exact float corpus is 256 B/vector (64 × float32); PQ stores
  * 8 one-byte codes — a 32× compression — and scores candidates against a
  * per-query lookup table without touching the original floats. The
  * asymmetric-distance (ADC) scan is the workhorse of IVF-PQ systems
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011); the engine keeps the SAME plan shape here: one encode scan,
  * one broadcast of the (tiny) query set, one partitioned top-k window.
  *
  * Determinism contract (what makes this ORACLE-checkable, unlike most ANN
  * code): the codebook is not trained — subspace centroids are the
  * sub-vectors of 16 fixed anchor rows (vec_id < 16), a deterministic,
  * scale-independent choice (k-means training is demonstrated separately in
  * [[KMeans]]; PQ's value is the encode/ADC mechanics, which are identical
  * whatever produced the codebook). All distances are the fixed-point
  * long arithmetic of [[VectorOps]]: d²(a,b) is composed from three
  * `fixed_dot` terms (aa + bb − 2ab), every term an exact ×1e12 long, so
  * encode argmins and ADC rankings are bit-identical to the DuckDB twin
  * at any parallelism.
  */
object ProductQuantization {

  val SubSpaces = 8
  val CodeBookSize = 16

  private def fd(a: Column, b: Column): Column =
    graft.functions.FixedDotFunctions.fixedDot(a, b)

  /** Fixed-point squared distance via the dot identity; exact long. */
  private def d2(a: Column, b: Column): Column =
    fd(a, a) + fd(b, b) - lit(2L) * fd(a, b)

  /** Top-k ADC search of every query (vec_id in [qFrom, qTo]) against the
    * PQ-encoded corpus. Returns (qid, rank, vec_id, dist_fx) with dist_fx
    * the exact fixed-point (×1e12) asymmetric squared distance. */
  def pqTopK(emb: DataFrame, qFrom: Long, qTo: Long, k: Int): DataFrame = {
    val s = emb.sparkSession
    graft.functions.FixedDotFunctions.register(s)
    val subW = 64 / SubSpaces

    // codebook: the 16 anchor rows, collected like any broadcast codebook
    // (K × dim floats — driver-bounded regardless of corpus size)
    val anchors: Array[Array[Float]] = emb
      .filter(col("vec_id") < CodeBookSize).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    require(anchors.length == CodeBookSize, s"need $CodeBookSize anchors")
    // per-subspace array-of-arrays literal: codebook(m)(k) = anchor k's
    // m-th sub-vector
    val codebook: IndexedSeq[Column] = (0 until SubSpaces).map { m =>
      typedlit(anchors.toIndexedSeq.map(a =>
        a.slice(m * subW, (m + 1) * subW).toIndexedSeq))
    }

    def sub(e: Column, m: Int): Column = slice(e, lit(m * subW + 1), lit(subW))

    // encode: one scan; per subspace the argmin over 16 codes of
    // (cc − 2xc) — the aa term is common to every candidate. Ties break to
    // the smallest code via array_position's first-match semantics.
    def codeFor(m: Int): Column = {
      val scores = transform(codebook(m),
        c => fd(c, c) - lit(2L) * fd(sub(col("embedding"), m), c))
      array_position(scores, array_min(scores)).cast("int")
    }
    val encoded = emb.select(col("vec_id") +: (0 until SubSpaces)
      .map(m => codeFor(m).as(s"c$m")): _*)

    // queries: tiny frame, broadcast; ADC = Σ_m d²(q_m, codebook[m][c_m])
    val queries = emb.filter(col("vec_id").between(qFrom, qTo))
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val dist = (0 until SubSpaces).map { m =>
      d2(sub(col("qemb"), m), element_at(codebook(m), col(s"c$m")))
    }.reduce(_ + _)
    val scored = encoded.crossJoin(broadcast(queries))
      .select(col("qid"), col("vec_id"), dist.as("dist_fx"))
    val w = Window.partitionBy("qid").orderBy(col("dist_fx"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("dist_fx"))
      .orderBy("qid", "rank")
  }
}
