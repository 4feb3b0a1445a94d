package graft.sql

/** Dialect-neutral AST for the analytic-SELECT subset the reference
  * transpiles (/root/reference/src/transform/etl_pipeline.py:259-373).
  *
  * The reference's namesake capability is sqlglot: author canonical
  * Postgres SQL once, emit *text* for seven warehouse dialects. Rounds 1-8
  * collapsed that into native Spark execution (Spark is itself one of the
  * reference's targets); this module restores the text-emission surface so
  * a migrating user keeps the "write once, run on BigQuery/Snowflake/..."
  * entry point. Everything here is public knowledge: the grammar is the
  * ANSI SELECT core, and each emitter follows the target warehouse's own
  * published SQL reference (quoting character, interval literal form,
  * timestamp arithmetic functions, type names).
  *
  * Nodes keep the source's lexical intent where it matters for fidelity
  * ([[NumberLit]] keeps the original text so `1e18` doesn't become
  * `1.0E18`; [[Ident]] remembers whether the source quoted it so we only
  * re-quote when the target requires it).
  */
sealed trait SqlExpr

/** Numeric literal; `text` is the verbatim source spelling. */
final case class NumberLit(text: String) extends SqlExpr

/** Single-quoted string literal (value is unescaped). */
final case class StringLit(value: String) extends SqlExpr

final case class BoolLit(value: Boolean) extends SqlExpr
case object NullLit extends SqlExpr

/** `TIMESTAMP '2024-01-01 00:00:00'` / `DATE '2024-01-01'`. */
final case class TimestampLit(value: String) extends SqlExpr
final case class DateLit(value: String) extends SqlExpr

/** Interval literal normalized at parse time to (amount, singular upper
  * unit), e.g. `INTERVAL '24 hours'` -> IntervalLit("24", "HOUR"). Each
  * dialect re-spells it (Postgres `INTERVAL '24 HOUR'`, Spark/Trino/MySQL
  * `INTERVAL '24' HOUR`, BigQuery `INTERVAL 24 HOUR`). */
final case class IntervalLit(amount: String, unit: String) extends SqlExpr

/** Identifier; `quoted` = source wrapped it in its quote char. */
final case class Ident(name: String, quoted: Boolean = false)

/** Column reference, optionally qualified (`t.col`). */
final case class ColRef(table: Option[Ident], col: Ident) extends SqlExpr

/** Bare `*` (only valid in a select list or COUNT(*)). */
case object Star extends SqlExpr

/** Window specification for `fn(...) OVER (...)`. The frame, when
  * present, is (unit, loBound, hiBound) in canonical spelling, e.g.
  * ("ROWS", "UNBOUNDED PRECEDING", "CURRENT ROW") — identical across all
  * seven targets, so it emits verbatim. */
final case class WindowSpec(partitionBy: List[SqlExpr],
                            orderBy: List[OrderItem],
                            frame: Option[(String, String, String)])

/** Function call; `name` is upper-cased at parse time. `over` carries the
  * window for analytic calls. */
final case class FuncCall(name: String, args: List[SqlExpr],
                          distinct: Boolean = false,
                          over: Option[WindowSpec] = None) extends SqlExpr

/** EXTRACT(field FROM expr) — field kept upper ("HOUR", "DOW", ...). */
final case class Extract(field: String, from: SqlExpr) extends SqlExpr

/** CAST(expr AS type(args...)); `tpe` normalized upper ("DOUBLE",
  * "VARCHAR", "DECIMAL", "BIGINT", ...), `typeArgs` the precision list. */
final case class Cast(expr: SqlExpr, tpe: String,
                      typeArgs: List[Int] = Nil) extends SqlExpr

/** Binary operator: arithmetic + - * / %, concat ||, comparisons
  * = <> < <= > >=, boolean AND OR. `!=` is normalized to `<>`. */
final case class BinOp(op: String, left: SqlExpr, right: SqlExpr) extends SqlExpr

/** Unary `-expr` or `NOT expr`. */
final case class UnaryOp(op: String, expr: SqlExpr) extends SqlExpr

final case class Between(expr: SqlExpr, lo: SqlExpr, hi: SqlExpr,
                         negated: Boolean = false) extends SqlExpr
final case class InList(expr: SqlExpr, items: List[SqlExpr],
                        negated: Boolean = false) extends SqlExpr
final case class Like(expr: SqlExpr, pattern: SqlExpr,
                      negated: Boolean = false) extends SqlExpr
final case class IsNull(expr: SqlExpr, negated: Boolean = false) extends SqlExpr

/** Scalar subquery in expression position — `WHERE x > (SELECT ...)`.
  * Spelled identically (a parenthesized query) in all seven targets; the
  * single-column/single-row contract is the engine's to enforce, as in
  * every warehouse. */
final case class ScalarSubquery(query: QueryExpr) extends SqlExpr

/** `EXISTS (SELECT ...)` — correlation happens via ordinary qualified
  * column references inside the subquery. Negation is the generic
  * `UnaryOp("NOT", _)`, so `NOT EXISTS` round-trips without a flag. */
final case class Exists(query: QueryExpr) extends SqlExpr

/** `expr [NOT] IN (SELECT ...)` — the subquery sibling of [[InList]]. */
final case class InSubquery(expr: SqlExpr, query: QueryExpr,
                            negated: Boolean = false) extends SqlExpr

/** Searched CASE (`operand` empty) or simple CASE (`operand` set). */
final case class CaseWhen(operand: Option[SqlExpr],
                          branches: List[(SqlExpr, SqlExpr)],
                          otherwise: Option[SqlExpr]) extends SqlExpr

final case class SelectItem(expr: SqlExpr, alias: Option[Ident])

/** FROM item: a named table or a parenthesized derived subquery. */
sealed trait FromItem { def alias: Option[Ident] }
final case class TableRef(name: Ident, alias: Option[Ident]) extends FromItem
final case class DerivedTable(query: QueryExpr, aliasIdent: Ident) extends FromItem {
  def alias: Option[Ident] = Some(aliasIdent)
}

/** `kind` in {"JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN", "CROSS JOIN"}. */
final case class JoinClause(kind: String, table: FromItem, on: Option[SqlExpr])

final case class OrderItem(expr: SqlExpr, desc: Boolean)

/** A query expression: a single SELECT block, or a set operation over two
  * of them. CTEs attach at the top level ([[Query]]). */
sealed trait QueryExpr

/** One SELECT statement of the supported subset. */
final case class SelectStmt(
    items: List[SelectItem],
    from: Option[FromItem],
    joins: List[JoinClause],
    where: Option[SqlExpr],
    groupBy: List[SqlExpr],
    having: Option[SqlExpr],
    orderBy: List[OrderItem],
    limit: Option[Long],
    distinct: Boolean = false,
    offset: Option[Long] = None) extends QueryExpr

/** `op` in {"UNION", "UNION ALL", "INTERSECT", "EXCEPT"} — spelled the
  * same in all seven targets. A trailing ORDER BY / LIMIT / OFFSET after
  * an unparenthesized final operand binds to the WHOLE set operation
  * (ANSI), so the parser hoists it here rather than leaving it on the
  * last SELECT. */
final case class SetOp(op: String, left: QueryExpr, right: QueryExpr,
                       orderBy: List[OrderItem] = Nil,
                       limit: Option[Long] = None,
                       offset: Option[Long] = None) extends QueryExpr

/** `INSERT INTO table [(col, ...)]` target prefix for a SELECT-backed
  * insert — spelled identically (modulo identifier quoting) in all seven
  * targets. */
final case class InsertTarget(table: Ident, columns: List[Ident])

/** Top-level statement: optional INSERT INTO target + optional WITH
  * clause + body. `insertInto = None` is a plain query. */
final case class Query(ctes: List[(Ident, QueryExpr)], body: QueryExpr,
                       insertInto: Option[InsertTarget] = None)

/** Parse failure with a 1-based position into the source text. */
final case class SqlParseException(message: String, pos: Int)
    extends RuntimeException(s"$message (at offset $pos)")
