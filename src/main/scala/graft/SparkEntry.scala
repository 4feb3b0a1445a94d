package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Behavioral, Domain, Extensions, Probes, Relational, Relational2, Relational3, Relational4, Relational5, Relational6, Relational7, Sketches, Transpile, Web}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one named entry per implemented operator from SURVEY.md §2
  * to a DataFrame builder over the driver's parquet tables; `oracleSql` holds
  * the DuckDB twin of each SQL-expressible query. Column names and row order
  * are made to match exactly (every query has a total ORDER BY and aliases
  * shared with its oracle).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q_join_star")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Relational2.queries ++ Relational3.queries ++
      Relational4.queries ++ Relational5.queries ++ Relational6.queries ++ Relational7.queries ++ Domain.queries ++
      Extensions.queries ++ Behavioral.queries ++ Sketches.queries ++ Web.queries ++
      Transpile.queries ++ Probes.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ Relational2.oracleSql ++ Relational3.oracleSql ++
      Relational4.oracleSql ++ Relational5.oracleSql ++ Relational6.oracleSql ++ Relational7.oracleSql ++ Domain.oracleSql ++
      Extensions.oracleSql ++ Behavioral.oracleSql ++ Sketches.oracleSql ++ Web.oracleSql ++
      Transpile.oracleSql ++ Probes.oracleSql
}
