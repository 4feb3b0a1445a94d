package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** BM25 keyword search over a document corpus — the lexical complement of
  * the vector similarity search in [[graft.sim.VectorOps]] (a training-data
  * pipeline needs both: ANN for semantic retrieval, BM25 for targeted
  * keyword probes and decontamination scans against eval sets).
  *
  * Distributed shape, chosen for 100 TB:
  *  - query terms are FIXED and FEW, so each term's tf is one
  *    `size(filter(toks, = term))` column — whole-stage-codegen projections
  *    over a single corpus scan, never an explode→groupBy→join over a
  *    posting list (which would shuffle the full token stream);
  *  - corpus stats (N, Σdl, per-term df) are ONE tiny agg row broadcast
  *    back with a crossJoin — the same scalar two-pass used by the VaR
  *    queries; nothing wide ever shuffles;
  *  - top-k by score compiles to TakeOrderedAndProject (per-partition
  *    heaps + driver merge of k rows, no global sort).
  *
  * Numeric parity with the DuckDB oracle: every input to the score is an
  * exact integer (tf, df, dl, N, Σdl); the float expression tree is written
  * identically on both engines, and the one libm call (LN in the IDF) is
  * quantized through DECIMAL(38,12) exactly like the cumulative-product
  * query (`Relational2.cumprod`), absorbing sub-quantum libm divergence.
  * The final score is rounded to 6 decimals, ties broken by doc id.
  */
object KeywordSearch {

  /** idf_t = ln(1 + (N - df + 0.5)/(df + 0.5)), quantized for parity. */
  private def idf(nDocs: Column, df: Column): Column =
    log(lit(1.0) + (nDocs - df + lit(0.5)) / (df + lit(0.5)))
      .cast(DecimalType(38, 12)).cast("double")

  def bm25TopK(docs: DataFrame, id: Column, toks: Column,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val tfCols = terms.map(t =>
      size(filter(col("__toks"), x => x === lit(t))).cast("long")
        .as(s"tf_$t"))
    val base = docs.select(id.as("doc_id"), toks.as("__toks"))
      .select(col("doc_id") +: size(col("__toks")).cast("long").as("dl")
        +: tfCols: _*)
    val statCols = count(lit(1)).as("n_docs") +:
      sum(col("dl")).as("sum_dl") +:
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L))
        .as(s"df_$t"))
    val stats = base.agg(statCols.head, statCols.tail: _*)

    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val weights = terms.map { t =>
      val tf = col(s"tf_$t")
      idf(col("n_docs"), col(s"df_$t")) * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    }
    base.crossJoin(broadcast(stats))
      .select(col("doc_id") +: col("dl") +: terms.map(t => col(s"tf_$t")) :+
        round(weights.reduce(_ + _), 6).as("score"): _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
