package graft.sources

import org.apache.spark.sql.DataFrame

/** Schema-evolution union — corpora are ingested over months; every
  * batch generation has its own column set (new quality scores appear,
  * deprecated fields vanish). The merge contract at scale: positional
  * union is silently WRONG the first time column order drifts, so every
  * multi-generation merge goes by NAME, with absent columns as nulls —
  * old rows never block a new column, new rows never lose one.
  * Readers treat null as "predates this field" (same convention the
  * JSONL quarantine source applies to drifted objects).
  */
object Evolution {

  /** Union all batch generations by column name; the result carries the
    * union of all schemas, null where a generation lacks a column. */
  def unionEvolved(batches: Seq[DataFrame]): DataFrame = {
    require(batches.nonEmpty, "no batches to union")
    batches.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
