package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training-data pipelines: deterministic
  * stratified sampling and sequence packing. Like [[EventAnalytics]], both
  * are window/aggregate compositions whose outputs are integer- and
  * string-exact — hash-exact oracle twins, no float leniency. */
object CorpusOps {

  /** Deterministic stratified sample: the `n` smallest md5(id) per stratum.
    * Hash order is uniform and content-free, so this is an unbiased
    * per-stratum sample that is stable under reruns, repartitioning, and
    * corpus growth restricted to other ids — `rank` makes the draw
    * reproducible and auditable. One partitioned window, no shuffle beyond
    * the stratum exchange; at scale strata shard naturally. */
  def stratifiedSample(df: DataFrame, idCol: Column, strataCol: Column,
                       n: Int): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(md5(idCol.cast("string")), idCol)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
  }

  /** 12-hex-digit md5-prefix boundary for a keep-rate in [0,1]: a row is
    * kept iff its digest prefix compares below the boundary STRING — no
    * float arithmetic anywhere, so any engine with md5 draws the identical
    * sample. Rates ≥ 1 map to "g" (lexicographically above every hex
    * digit → keep all); quantization error below 2⁻⁴⁸. */
  def rateBoundary(rate: Double): String =
    if (rate >= 1.0) "g"
    else {
      val v = math.max((rate * 281474976710656.0).toLong, 0L)
      val s = java.lang.Long.toHexString(v)
      ("0" * (12 - s.length)) + s
    }

  /** Weighted mixture sampling: downsample each source to its target rate
    * (web 50%, wiki 100%, … — how a training mixture is actually built)
    * with the same deterministic id-hash draw as [[hashSplit]]: stable
    * under reruns and repartitioning, independent across sources, and a
    * pure filter — no shuffle at all. Sources absent from `rates` are
    * dropped (rate 0). */
  def mixtureSample(df: DataFrame, idCol: Column, sourceCol: Column,
                    rates: Map[String, Double]): DataFrame = {
    val boundaries = rates.map { case (k, r) => k -> rateBoundary(r) }
    df.withColumn("__b", element_at(typedlit(boundaries), sourceCol))
      .filter(col("__b").isNotNull &&
        substring(md5(idCol.cast("string")), 1, 12) < col("__b"))
      .drop("__b")
  }

  /** √-temperature source rebalancing: keep each source at rate
    * min(1, c/√n_s) — the α=0.5 temperature-sampling cap that shrinks a
    * dominant source's contribution to ∝ √n_s while keeping small
    * sources whole (the standard multilingual/multi-source mixture
    * move). A pure filter: the draw is the [[hashSplit]] md5-prefix
    * compare against an IN-PLAN fixed-point boundary
    * floor(rate·16^12), so the kept set is deterministic, rerun- and
    * repartition-stable, and cross-engine exact (÷, ×, √, floor are all
    * correctly-rounded IEEE ops). The only extra work over a plain scan
    * is the per-source count dimension, broadcast back — no shuffle of
    * the corpus, no per-source window, no hot partitions at any source
    * skew. */
  def temperatureSample(df: DataFrame, idCol: Column, sourceCol: Column,
                        c: Double): DataFrame = {
    val counts = df.groupBy(sourceCol.as("__src")).agg(count(lit(1)).as("__n"))
    val bound = floor(least(lit(1.0), lit(c) / sqrt(col("__n")))
      * lit(281474976710656.0)).cast("long")
    val prefix = conv(substring(md5(idCol.cast("string")), 1, 12), 16, 10)
      .cast("long")
    df.withColumn("__src", sourceCol)
      .join(broadcast(counts), "__src")
      .filter(prefix < bound)
      .drop("__src", "__n")
  }

  /** Bottom-k hash sample: the `k` rows with globally smallest md5(id) —
    * the KMV construction applied to whole rows. A deterministic uniform
    * sample that is mergeable (union two samples, keep the k smallest) and
    * partitioning-invariant, which makes any downstream statistic a
    * *sketch* with those properties: [[graft.queries.Extensions]] derives a
    * distributed quantile estimate this way, the scale path for exact
    * `percentile` when the column has billions of rows. Compiles to
    * TakeOrderedAndProject — per-partition size-k heaps merged on the
    * driver, no global sort, no full shuffle. */
  def hashSample(df: DataFrame, idCol: Column, k: Int): DataFrame =
    df.withColumn("__h", md5(idCol.cast("string")))
      .orderBy(col("__h"), idCol)
      .limit(k)
      .drop("__h")

  /** Quality-decile binning: ntile(buckets) per stratum over the quality
    * order (ties broken by id so the assignment is total and rerun-stable),
    * summarized per (stratum, bucket). The standard first look at a corpus
    * quality distribution before choosing filter thresholds. One partitioned
    * window + one hash aggregate; strata shard naturally at scale. */
  def qualityBins(df: DataFrame, strataCol: Column, qualityCol: Column,
                  idCol: Column, buckets: Int): DataFrame = {
    val w = Window.partitionBy(strataCol).orderBy(qualityCol, idCol)
    df.withColumn("bucket", ntile(buckets).over(w))
      .groupBy(strataCol, col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(qualityCol).as("min_quality"),
        max(qualityCol).as("max_quality"))
  }

  /** Token-budget selection: walk each stratum best-quality-first and keep
    * documents while the running token count stays within `budget` — how a
    * fixed-size training corpus is actually cut from a larger pool. The
    * order must be total (pass a tie-breaking id as the last `orderCols`
    * entry) or the kept set is not deterministic. One partitioned window +
    * a filter; the budget cut needs no second pass.
    *
    * WARNING: empty `strataCols` builds a GLOBAL ordered window — one task,
    * `Exchange SinglePartition`, the engine's canonical scale-killer. It
    * exists only as the small-data/parity form; every registered query
    * passes strata (q_token_budget strata = lang). A single global budget
    * at scale should rank via [[graft.queries.DistributedRank]] first. */
  def tokenBudget(df: DataFrame, tokensCol: Column, budget: Long,
                  orderCols: Seq[Column],
                  strataCols: Seq[Column]): DataFrame = {
    val base = if (strataCols.isEmpty) Window.partitionBy()
               else Window.partitionBy(strataCols: _*)
    val w = base.orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(tokensCol.cast("long")).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Inverse-frequency ("flattening") mixture: downsample every group to
    * the size of the smallest group — the α→0 limit of temperature-based
    * mixture reweighting, used to stop a dominant source/language from
    * swamping the mixture. Rates are derived FROM THE DATA (n_min/n_g per
    * group) but applied through the same exact-integer hash thresholding as
    * [[mixtureSample]]: the keep boundary is `(n_min·2²⁴) div n_g` rendered
    * as a 6-hex-digit string, so both engines draw the identical sample
    * with zero float arithmetic (quantization 2⁻²⁴; exact for n_min up to
    * 2³⁹ — far beyond any per-group document count). Two tiny aggregates
    * (#groups rows) + one broadcast join + a pure filter. */
  def flattenedMixture(df: DataFrame, idCol: Column,
                       groupCol: Column): DataFrame = {
    val counts = df.groupBy(groupCol.as("__g")).agg(count(lit(1)).as("__n"))
    val nmin = counts.agg(min(col("__n")).as("__nmin"))
    val bounds = counts.crossJoin(broadcast(nmin))
      .withColumn("__b", when(col("__n") === col("__nmin"), lit("g"))
        .otherwise(lpad(lower(hex(
          expr("(__nmin * 16777216) div __n"))), 6, "0")))
      .select(col("__g"), col("__b"))
    df.join(broadcast(bounds), groupCol === col("__g"))
      .filter(substring(md5(idCol.cast("string")), 1, 6) < col("__b"))
      .drop("__g", "__b")
  }

  /** Overlapping document chunking: split every document into windows of
    * `chunkLen` characters starting every `stride` (< chunkLen ⇒ overlap
    * of chunkLen − stride) — the context-window prep step between a raw
    * corpus and a trainer. Pure per-row fan-out (sequence + posexplode;
    * no shuffle, no state): a document of n chars yields ⌈n/stride⌉
    * chunks, each tagged with its offset and content digest so
    * downstream dedup/packing can run on chunks exactly like documents.
    * Empty documents yield no chunks. */
  def chunkDocs(df: DataFrame, idCol: Column, textCol: Column,
                nCharsCol: Column, chunkLen: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkLen >= stride,
      s"need 0 < stride <= chunkLen: $stride, $chunkLen")
    df.filter(nCharsCol > 0)
      .select(idCol.as("doc_id"), textCol.as("__text"),
        sequence(lit(0L), nCharsCol.cast("long") - 1,
          lit(stride.toLong)).as("__starts"))
      .select(col("doc_id"), col("__text"),
        posexplode(col("__starts")).as(Seq("chunk_id", "chunk_start")))
      .withColumn("__chunk",
        expr(s"substring(__text, cast(chunk_start + 1 as int), $chunkLen)"))
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
        length(col("__chunk")).cast("long").as("chunk_len"),
        md5(col("__chunk")).as("chunk_md5"))
  }

  /** Greedy sequence packing: walk documents in `orderCol` order, assign
    * each to the bin its running token count starts in —
    * `bin_id = (cumsum − tokens) div binTokens`. Contiguous documents land
    * in the same bin until the budget spills (a document straddling the
    * boundary is attributed to the bin it starts in, the standard
    * streaming-packing convention). One window + one aggregate; partition
    * the window by a shard column at scale (packing is per-shard there,
    * which is also what a distributed trainer wants). Returns per-bin
    * (bin_id, n_docs, total_tokens, first_id, last_id).
    *
    * WARNING: empty `partitionCols` builds a GLOBAL ordered window — one
    * task, `Exchange SinglePartition`; small-data/parity form only. Every
    * registered query passes a shard column (q_pack_sequences = lang). */
  def packSequences(df: DataFrame, idCol: Column, tokensCol: Column,
                    binTokens: Long,
                    partitionCols: Seq[String] = Nil): DataFrame = {
    val base = if (partitionCols.isEmpty) Window.partitionBy()
               else Window.partitionBy(partitionCols.map(col): _*)
    val w = base.orderBy(col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keys = partitionCols.map(col) :+ col("bin_id")
    df.select((partitionCols.map(col) :+ idCol.as("__id") :+
        tokensCol.cast("long").as("__tok")): _*)
      .withColumn("__cum", sum(col("__tok")).over(w))
      // integer floor division (`div`), not double `/`: token cumsums at
      // corpus scale exceed double's exact-integer range
      .withColumn("bin_id", expr(s"(__cum - __tok) div $binTokens"))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("total_tokens"),
        min(col("__id")).as("first_id"),
        max(col("__id")).as("last_id"))
      .orderBy(keys: _*)
  }
}
