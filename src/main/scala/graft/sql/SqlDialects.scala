package graft.sql

/** Per-warehouse SQL text generation for the seven dialects the reference
  * targets (/root/reference/src/transform/etl_pipeline.py:363-365 names
  * postgres, bigquery, snowflake, duckdb, spark, trino, mysql).
  *
  * Every dialect rule below is that engine's own published syntax:
  *   - identifier quote char: double-quote (Postgres/DuckDB/Trino/
  *     Snowflake) vs backtick (MySQL/Spark/BigQuery);
  *   - interval literals: `INTERVAL '24 HOUR'` (PG family),
  *     `INTERVAL '24' HOUR` (Spark/Trino ANSI form), `INTERVAL 24 HOUR`
  *     (MySQL/BigQuery unquoted quantity);
  *   - timestamp arithmetic: infix everywhere except BigQuery, which
  *     requires TIMESTAMP_ADD/TIMESTAMP_SUB;
  *   - DATE_TRUNC: unit-first string everywhere except BigQuery
  *     (TIMESTAMP_TRUNC(ts, HOUR), bare unit last) and MySQL (no trunc
  *     function at all — rewritten to DATE_FORMAT with a unit-appropriate
  *     format string);
  *   - type names: BigQuery FLOAT64/INT64/STRING/BIGNUMERIC, Spark STRING,
  *     Postgres DOUBLE PRECISION/TEXT, MySQL CHAR in CAST position;
  *   - semantics-preserving renames: MySQL `STDDEV` is the *population*
  *     stddev, so Postgres `STDDEV` (sample) must become `STDDEV_SAMP`;
  *     `NOW()` becomes `CURRENT_TIMESTAMP()` where NOW is not defined
  *     (Spark, BigQuery, Snowflake); MySQL string concat is `CONCAT(...)`
  *     because infix `||` is logical-OR there by default.
  *
  * Identifiers are quoted only when required (source quoted it, it
  * collides with a reserved word, or it is not a plain lower-case word) —
  * the same policy sqlglot applies with `identify=False`.
  */
object SqlDialects {

  /** ANSI-core reserved words that force quoting in any target. */
  private val Reserved: Set[String] = Set(
    "ALL", "AND", "AS", "ASC", "BETWEEN", "BY", "CASE", "CAST", "COLUMN",
    "CREATE", "CROSS", "CURRENT_DATE", "CURRENT_TIMESTAMP", "DATE",
    "DEFAULT", "DELETE", "DESC", "DISTINCT", "DROP", "ELSE", "END",
    "EXCEPT", "EXISTS", "FALSE", "FROM", "FULL", "GROUP", "HAVING", "IN",
    "INNER", "INSERT", "INTERSECT", "INTERVAL", "INTO", "IS", "JOIN",
    "KEY", "LEFT", "LIKE", "LIMIT", "NATURAL", "NOT", "NULL", "ON", "OR",
    "ORDER", "OUTER", "PRIMARY", "RIGHT", "SELECT", "TABLE", "THEN",
    "TIMESTAMP", "TO", "TRUE", "UNION", "UPDATE", "USER", "USING",
    "VALUES", "WHEN", "WHERE")

  sealed trait IntervalStyle
  case object IntervalPg extends IntervalStyle        // INTERVAL '24 HOUR'
  case object IntervalAnsi extends IntervalStyle      // INTERVAL '24' HOUR
  case object IntervalUnquoted extends IntervalStyle  // INTERVAL 24 HOUR

  sealed trait TruncStyle
  case object TruncUnitFirst extends TruncStyle  // DATE_TRUNC('hour', ts)
  case object TruncTsFirst extends TruncStyle    // TIMESTAMP_TRUNC(ts, HOUR)
  case object TruncDateFormat extends TruncStyle // MySQL DATE_FORMAT rewrite

  final case class DialectSpec(
      name: String,
      identQuote: Char,
      intervalStyle: IntervalStyle,
      truncStyle: TruncStyle,
      tsArithViaFuncs: Boolean,          // BigQuery TIMESTAMP_ADD/SUB
      concatViaFunc: Boolean,            // MySQL CONCAT
      funcRenames: Map[String, String],
      castTypes: Map[String, String])    // keyed by normalized parse type

  private val common = Map.empty[String, String]

  val Postgres: DialectSpec = DialectSpec(
    "postgres", '"', IntervalPg, TruncUnitFirst,
    tsArithViaFuncs = false, concatViaFunc = false,
    funcRenames = common,
    castTypes = Map("DOUBLE" -> "DOUBLE PRECISION", "FLOAT" -> "REAL",
      "STRING" -> "TEXT", "INT" -> "INT", "INTEGER" -> "INT"))

  val DuckDb: DialectSpec = DialectSpec(
    "duckdb", '"', IntervalPg, TruncUnitFirst,
    tsArithViaFuncs = false, concatViaFunc = false,
    funcRenames = common,
    castTypes = Map("STRING" -> "VARCHAR", "TEXT" -> "VARCHAR"))

  val Spark: DialectSpec = DialectSpec(
    "spark", '`', IntervalAnsi, TruncUnitFirst,
    tsArithViaFuncs = false, concatViaFunc = false,
    funcRenames = Map("NOW" -> "CURRENT_TIMESTAMP"),
    castTypes = Map("VARCHAR" -> "STRING", "TEXT" -> "STRING",
      "CHAR" -> "STRING"))

  val Trino: DialectSpec = DialectSpec(
    "trino", '"', IntervalAnsi, TruncUnitFirst,
    tsArithViaFuncs = false, concatViaFunc = false,
    funcRenames = common,
    castTypes = Map("STRING" -> "VARCHAR", "TEXT" -> "VARCHAR",
      "FLOAT" -> "REAL"))

  val MySql: DialectSpec = DialectSpec(
    "mysql", '`', IntervalUnquoted, TruncDateFormat,
    tsArithViaFuncs = false, concatViaFunc = true,
    funcRenames = Map("STDDEV" -> "STDDEV_SAMP"),
    castTypes = Map("VARCHAR" -> "CHAR", "STRING" -> "CHAR",
      "TEXT" -> "CHAR", "BIGINT" -> "SIGNED", "INT" -> "SIGNED",
      "INTEGER" -> "SIGNED", "SMALLINT" -> "SIGNED"))

  val BigQuery: DialectSpec = DialectSpec(
    "bigquery", '`', IntervalUnquoted, TruncTsFirst,
    tsArithViaFuncs = true, concatViaFunc = false,
    funcRenames = Map("NOW" -> "CURRENT_TIMESTAMP"),
    castTypes = Map("DOUBLE" -> "FLOAT64", "FLOAT" -> "FLOAT64",
      "REAL" -> "FLOAT64", "BIGINT" -> "INT64", "INT" -> "INT64",
      "INTEGER" -> "INT64", "SMALLINT" -> "INT64", "VARCHAR" -> "STRING",
      "TEXT" -> "STRING", "CHAR" -> "STRING", "DECIMAL" -> "BIGNUMERIC",
      "NUMERIC" -> "BIGNUMERIC", "BOOLEAN" -> "BOOL"))

  val Snowflake: DialectSpec = DialectSpec(
    "snowflake", '"', IntervalPg, TruncUnitFirst,
    tsArithViaFuncs = false, concatViaFunc = false,
    funcRenames = Map("NOW" -> "CURRENT_TIMESTAMP"),
    castTypes = Map("STRING" -> "VARCHAR", "TEXT" -> "VARCHAR"))

  val all: Map[String, DialectSpec] = Map(
    "postgres" -> Postgres, "bigquery" -> BigQuery, "snowflake" -> Snowflake,
    "duckdb" -> DuckDb, "spark" -> Spark, "trino" -> Trino, "mysql" -> MySql)

  /** MySQL DATE_FORMAT equivalents of DATE_TRUNC units. */
  private val mysqlTruncFormats: Map[String, String] = Map(
    "minute" -> "%Y-%m-%d %H:%i:00",
    "hour"   -> "%Y-%m-%d %H:00:00",
    "day"    -> "%Y-%m-%d 00:00:00",
    "month"  -> "%Y-%m-01 00:00:00",
    "year"   -> "%Y-01-01 00:00:00")

  // =============================================================== emitter
  final class Generator(d: DialectSpec) {

    /** Emit a full statement: INSERT target (if any) + WITH clause (if
      * any) + query body. */
    def sql(q: Query): String = {
      val sb = new StringBuilder
      q.insertInto.foreach { t =>
        sb ++= "INSERT INTO " + ident(t.table)
        if (t.columns.nonEmpty)
          sb ++= " (" + t.columns.map(ident).mkString(", ") + ")"
        sb ++= "\n"
      }
      if (q.ctes.nonEmpty) {
        sb ++= "WITH "
        sb ++= q.ctes.map { case (name, body) =>
          ident(name) + " AS (\n" + indent(queryExpr(body)) + "\n)"
        }.mkString(", ")
        sb ++= "\n"
      }
      sb ++= queryExpr(q.body)
      sb.toString
    }

    private def indent(s: String): String =
      s.linesIterator.map("  " + _).mkString("\n")

    private def queryExpr(q: QueryExpr): String = q match {
      case s: SelectStmt => selectSql(s)
      case SetOp(op, l, r, ord, lim, off) =>
        // set operands that are themselves set ops keep explicit parens so
        // the emitted text preserves the parsed association; a SELECT
        // operand carrying its own ORDER BY/LIMIT/OFFSET must also be
        // parenthesized — bare, those clauses would bind to the whole set
        // op on re-parse (and Postgres rejects them mid-chain outright)
        def side(x: QueryExpr): String = x match {
          case _: SetOp => "(\n" + indent(queryExpr(x)) + "\n)"
          case s: SelectStmt
              if s.orderBy.nonEmpty || s.limit.nonEmpty || s.offset.nonEmpty =>
            "(\n" + indent(queryExpr(x)) + "\n)"
          case _ => queryExpr(x)
        }
        val sb = new StringBuilder(side(l) + "\n" + op + "\n" + side(r))
        if (ord.nonEmpty)
          sb ++= "\nORDER BY\n  " + ord.map(orderItem).mkString(", ")
        lim.foreach(n => sb ++= "\nLIMIT " + n)
        off.foreach(n => sb ++= "\nOFFSET " + n)
        sb.toString
    }

    private def selectSql(stmt: SelectStmt): String = {
      val sb = new StringBuilder
      sb ++= "SELECT"
      if (stmt.distinct) sb ++= " DISTINCT"
      sb ++= "\n"
      sb ++= stmt.items.map(it => "  " + selectItem(it)).mkString(",\n")
      stmt.from.foreach { t => sb ++= "\nFROM " + fromItem(t) }
      stmt.joins.foreach { j =>
        sb ++= "\n" + j.kind + " " + fromItem(j.table)
        j.on.foreach(e => sb ++= " ON " + expr(e, 0))
      }
      stmt.where.foreach { w =>
        sb ++= "\nWHERE\n  " + conjuncts(w).mkString("\n  AND ")
      }
      if (stmt.groupBy.nonEmpty)
        sb ++= "\nGROUP BY\n  " + stmt.groupBy.map(expr(_, 0)).mkString(", ")
      stmt.having.foreach(h => sb ++= "\nHAVING\n  " + expr(h, 0))
      if (stmt.orderBy.nonEmpty)
        sb ++= "\nORDER BY\n  " + stmt.orderBy.map(orderItem).mkString(", ")
      stmt.limit.foreach(l => sb ++= "\nLIMIT " + l)
      stmt.offset.foreach(o => sb ++= "\nOFFSET " + o)
      sb.toString
    }

    /** Split a top-level AND chain for one-conjunct-per-line pretty form. */
    private def conjuncts(e: SqlExpr): List[String] = e match {
      case BinOp("AND", l, r) => conjuncts(l) ++ conjuncts(r)
      case other => List(expr(other, precOf("AND") + 1))
    }

    private def selectItem(it: SelectItem): String = {
      val e = expr(it.expr, 0)
      it.alias match {
        case Some(a) => e + " AS " + ident(a)
        case None => e
      }
    }

    private def fromItem(t: FromItem): String = t match {
      case TableRef(name, alias) =>
        ident(name) + alias.map(a => " AS " + ident(a)).getOrElse("")
      case DerivedTable(q, alias) =>
        "(\n" + indent(queryExpr(q)) + "\n) AS " + ident(alias)
    }

    private def orderItem(o: OrderItem): String =
      expr(o.expr, 0) + (if (o.desc) " DESC" else "")

    private def ident(id: Ident): String = {
      val needs = id.quoted || Reserved(id.name.toUpperCase) ||
        !id.name.matches("[A-Za-z_][A-Za-z0-9_]*")
      if (needs) s"${d.identQuote}${id.name}${d.identQuote}" else id.name
    }

    /** Operator precedence, mirroring SqlParser's grammar exactly:
      * OR(1) < AND(2) < NOT(3) < predicates(4) < comparison(5) <
      * concat(6) < add/sub(7) < mul/div/mod(8) < unary minus(9) <
      * atoms(10). `||` sits BELOW add/sub per Postgres ("any other
      * operator" binds looser than plus/minus). */
    private def precOf(op: String): Int = op match {
      case "OR" => 1
      case "AND" => 2
      case "=" | "<>" | "<" | "<=" | ">" | ">=" => 5
      case "||" => 6
      case "+" | "-" => 7
      case "*" | "/" | "%" => 8
      case _ => 10
    }

    /** Emit with minimal parentheses: wrap when child binds looser than
      * the context (`ctx` = minimum precedence the slot requires). */
    private[sql] def expr(e: SqlExpr, ctx: Int): String = e match {
      case NumberLit(t) => t
      case StringLit(v) => "'" + v.replace("'", "''") + "'"
      case BoolLit(b) => if (b) "TRUE" else "FALSE"
      case NullLit => "NULL"
      case TimestampLit(v) => s"TIMESTAMP '$v'"
      case DateLit(v) => s"DATE '$v'"
      case iv: IntervalLit => interval(iv)
      case ColRef(t, c) => t.map(x => ident(x) + ".").getOrElse("") + ident(c)
      case Star => "*"
      case f: FuncCall => funcCall(f)
      case c: Cast => cast(c)
      case Extract(field, from) => s"EXTRACT($field FROM ${expr(from, 0)})"

      // BigQuery: ts ± INTERVAL must be TIMESTAMP_ADD/TIMESTAMP_SUB
      case BinOp(op @ ("+" | "-"), l, iv: IntervalLit) if d.tsArithViaFuncs =>
        val f = if (op == "+") "TIMESTAMP_ADD" else "TIMESTAMP_SUB"
        s"$f(${expr(l, 0)}, ${interval(iv)})"

      // MySQL: infix || is logical OR, string concat must be CONCAT(...)
      case BinOp("||", _, _) if d.concatViaFunc =>
        "CONCAT(" + flattenConcat(e).map(expr(_, 0)).mkString(", ") + ")"

      case BinOp(op, l, r) =>
        val p = precOf(op)
        // comparisons are NON-associative: `a = b = c` won't re-parse, so
        // a comparison operand of a comparison must keep its parens.
        // EVERY binary operator takes rCtx = p + 1: the grammar is
        // left-associative, so an unparenthesized same-precedence right
        // child would re-parse left-grouped — wrong not just for -,/,%
        // but for mixed same-level ops (`a * (b / c)` ≠ `a * b / c` under
        // integer division; `a + (b - c)` ≠ `a + b - c` for float
        // rounding) and even for nominally associative ops, where the
        // structural parse(emit(ast)) == ast law (TranspilerProperties)
        // demands grouping be preserved exactly.
        val cmp = Set("=", "<>", "<", "<=", ">", ">=").contains(op)
        val lCtx = if (cmp) p + 1 else p
        val rCtx = p + 1
        val s = s"${expr(l, lCtx)} $op ${expr(r, rCtx)}"
        if (p < ctx) s"($s)" else s

      case UnaryOp("NOT", x) =>
        val s = "NOT " + expr(x, 4)
        if (3 < ctx) s"($s)" else s
      case UnaryOp(op, x) =>
        // adjacent `--` would lex as a line comment: parenthesize a
        // directly nested unary minus
        x match {
          case UnaryOp("-", _) => op + "(" + expr(x, 0) + ")"
          case _ => op + expr(x, 9)
        }

      // predicate operands parse at the concat level (prec 6): a bare
      // comparison (5) re-binds, so it keeps parens; ||/+/* don't need any
      case Between(x, lo, hi, neg) =>
        val s = s"${expr(x, 6)} ${if (neg) "NOT " else ""}BETWEEN ${expr(lo, 6)} AND ${expr(hi, 6)}"
        if (4 < ctx) s"($s)" else s
      case InList(x, items, neg) =>
        val s = s"${expr(x, 6)} ${if (neg) "NOT " else ""}IN (${items.map(expr(_, 0)).mkString(", ")})"
        if (4 < ctx) s"($s)" else s
      case Like(x, p, neg) =>
        val s = s"${expr(x, 6)} ${if (neg) "NOT " else ""}LIKE ${expr(p, 6)}"
        if (4 < ctx) s"($s)" else s
      case IsNull(x, neg) =>
        val s = s"${expr(x, 6)} IS ${if (neg) "NOT " else ""}NULL"
        if (4 < ctx) s"($s)" else s

      // subqueries: the query text inside the parens is each dialect's own
      // emission (quoting, intervals, ... all re-spelled); the surrounding
      // operators are spelled identically in all seven targets
      case ScalarSubquery(q) => "(" + queryExpr(q) + ")"
      case Exists(q) => "EXISTS (" + queryExpr(q) + ")"
      case InSubquery(x, q, neg) =>
        val s = s"${expr(x, 6)} ${if (neg) "NOT " else ""}IN (${queryExpr(q)})"
        if (4 < ctx) s"($s)" else s

      case CaseWhen(operand, branches, otherwise) =>
        val sb = new StringBuilder("CASE")
        operand.foreach(o => sb ++= " " + expr(o, 0))
        branches.foreach { case (c, v) =>
          sb ++= s" WHEN ${expr(c, 0)} THEN ${expr(v, 0)}"
        }
        otherwise.foreach(o => sb ++= " ELSE " + expr(o, 0))
        sb ++= " END"
        sb.toString
    }

    private def flattenConcat(e: SqlExpr): List[SqlExpr] = e match {
      case BinOp("||", l, r) => flattenConcat(l) ++ flattenConcat(r)
      case other => List(other)
    }

    private def interval(iv: IntervalLit): String = d.intervalStyle match {
      case IntervalPg       => s"INTERVAL '${iv.amount} ${iv.unit}'"
      case IntervalAnsi     => s"INTERVAL '${iv.amount}' ${iv.unit}"
      case IntervalUnquoted => s"INTERVAL ${iv.amount} ${iv.unit}"
    }

    private def funcCall(f: FuncCall): String = {
      // DATE_TRUNC needs per-dialect surgery before the generic path
      if (f.name == "DATE_TRUNC" && f.args.length == 2) f.args.head match {
        case StringLit(unit) =>
          val u = unit.toLowerCase
          d.truncStyle match {
            case TruncUnitFirst =>
              return s"DATE_TRUNC('$u', ${expr(f.args(1), 0)})"
            case TruncTsFirst =>
              return s"TIMESTAMP_TRUNC(${expr(f.args(1), 0)}, ${u.toUpperCase})"
            case TruncDateFormat =>
              val fmt = mysqlTruncFormats.getOrElse(u,
                throw new IllegalArgumentException(
                  s"mysql DATE_TRUNC rewrite: unsupported unit '$u'"))
              return s"DATE_FORMAT(${expr(f.args(1), 0)}, '$fmt')"
          }
        case _ => // dynamic unit: fall through to generic emission
      }
      val name = d.funcRenames.getOrElse(f.name, f.name)
      val dist = if (f.distinct) "DISTINCT " else ""
      val call = s"$name($dist${f.args.map(expr(_, 0)).mkString(", ")})"
      f.over match {
        case None => call
        case Some(w) => call + " OVER (" + windowSpec(w) + ")"
      }
    }

    /** The OVER body is spelled identically in all seven targets. */
    private def windowSpec(w: WindowSpec): String = {
      val parts = List(
        if (w.partitionBy.nonEmpty)
          Some("PARTITION BY " + w.partitionBy.map(expr(_, 0)).mkString(", "))
        else None,
        if (w.orderBy.nonEmpty)
          Some("ORDER BY " + w.orderBy.map(orderItem).mkString(", "))
        else None,
        w.frame.map { case (unit, lo, hi) => s"$unit BETWEEN $lo AND $hi" })
      parts.flatten.mkString(" ")
    }

    private def cast(c: Cast): String = {
      val t0 = d.castTypes.getOrElse(c.tpe, c.tpe)
      val t = if (c.typeArgs.nonEmpty) s"$t0(${c.typeArgs.mkString(", ")})" else t0
      s"CAST(${expr(c.expr, 0)} AS $t)"
    }
  }
}
