package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity primitives for the `q_fk_orphans` screen — the
  * dbt-style FK test a warehouse load runs before publishing (reference
  * analog: the load step of `/root/reference/src/transform/etl_pipeline
  * .py` assumes clean keys; this is the guard that makes the assumption
  * checkable). Kept as a library helper so specs can plant violations in
  * synthetic frames — the driver fixture is referentially clean, which
  * proves the zero case but not detection. */
object Integrity {

  /** Orphan profile of one FK edge: rows of `fact` whose `fk` has no
    * match in `dim.pk`. One LEFT ANTI join (broadcast when the dim is
    * small — the usual case for star schemas) + two count aggregates;
    * integer-exact ppm so the output hashes identically at any scale. */
  def orphanEdge(name: String, fact: DataFrame, fk: String,
                 dim: DataFrame, pk: String): DataFrame = {
    val n = fact.agg(count(lit(1)).as("n_rows"))
    fact.join(dim.select(col(pk)), fact(fk) === dim(pk), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
      .crossJoin(broadcast(n))
      .select(lit(name).as("fk"), col("n_orphans"), col("n_rows"),
        // integer division (Spark `/` is always double; a double→long
        // cast truncates in Spark but rounds in DuckDB — the Benford
        // parity trap), so the ppm stays a BIGINT in both engines
        // empty-fact guard: div by 0 is NULL in Spark but an error in
        // DuckDB's `//` — a NULL ppm would also silently pass any
        // `ppm <= budget` gate. An empty fact has zero orphans → 0 ppm.
        when(col("n_rows") === 0, 0L)
          .otherwise(expr("n_orphans * 1000000 div n_rows"))
          .as("orphan_ppm"))
  }
}
