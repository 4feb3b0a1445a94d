package graft.sql

import scala.collection.mutable.ListBuffer

/** Hand-written tokenizer + recursive-descent parser for the analytic
  * SELECT subset of Postgres SQL that the reference authors its canonical
  * queries in (/root/reference/src/transform/etl_pipeline.py:267-297).
  *
  * Coverage: SELECT [DISTINCT] list with aliases and `*`, FROM with
  * INNER/LEFT/RIGHT/FULL/CROSS joins and derived tables (subqueries in
  * FROM), WITH-clause CTEs, set operators (UNION [ALL] / INTERSECT /
  * EXCEPT, with ANSI precedence: INTERSECT binds tighter), window
  * functions (`OVER (PARTITION BY ... ORDER BY ... ROWS|RANGE BETWEEN
  * ... AND ...)`), WHERE / GROUP BY (exprs or ordinals) / HAVING /
  * ORDER BY [ASC|DESC] / LIMIT / OFFSET — including trailing
  * ORDER BY/LIMIT/OFFSET that bind to a whole set operation — functions
  * with DISTINCT args, CAST, CASE (simple + searched), BETWEEN / IN /
  * LIKE / IS [NOT] NULL, interval literals in both the Postgres spelling
  * (`INTERVAL '24 hours'`) and the quantity-quoted spelling
  * (`INTERVAL '24' HOUR`), TIMESTAMP/DATE literals, `||` concat (parsed
  * at Postgres's level: looser than +/-), scientific-notation numbers,
  * and both `"` and `` ` `` identifier quoting on input (the read side
  * is deliberately tolerant; the *write* side is strict per dialect —
  * see [[SqlDialects]]), subqueries in expressions (scalar
  * `(SELECT ...)`, `[NOT] EXISTS (...)`, `[NOT] IN (SELECT ...)` —
  * including correlated forms via qualified column references).
  *
  * Out of scope: DML other than INSERT INTO ... SELECT, DDL, LATERAL,
  * GROUPING SETS — the reference never transpiles those shapes, and
  * Spark-native execution covers them directly.
  */
object SqlParser {

  // ------------------------------------------------------------- tokenizer
  sealed trait Tok { def pos: Int }
  private final case class TWord(s: String, pos: Int) extends Tok   // bare identifier/keyword (upper for matching, raw kept)
  private final case class TQuoted(s: String, pos: Int) extends Tok // quoted identifier (verbatim)
  private final case class TStr(s: String, pos: Int) extends Tok    // string literal (unescaped)
  private final case class TNum(s: String, pos: Int) extends Tok    // number, original text
  private final case class TSym(s: String, pos: Int) extends Tok    // punctuation/operator
  private final case class TEnd(pos: Int) extends Tok

  private def tokenize(sql: String): Vector[Tok] = {
    val out = ListBuffer.empty[Tok]
    var i = 0
    val n = sql.length
    def peek(k: Int) = if (i + k < n) sql.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && peek(1) == '-') { // line comment
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && peek(1) == '*') {
        val end = sql.indexOf("*/", i + 2)
        if (end < 0) throw SqlParseException("unterminated block comment", i)
        i = end + 2
      } else if (c == '\'') {
        val sb = new StringBuilder; val start = i; i += 1
        var done = false
        while (!done) {
          if (i >= n) throw SqlParseException("unterminated string literal", start)
          val ch = sql.charAt(i)
          if (ch == '\'' && peek(1) == '\'') { sb += '\''; i += 2 }
          else if (ch == '\'') { i += 1; done = true }
          else { sb += ch; i += 1 }
        }
        out += TStr(sb.toString, start)
      } else if (c == '"' || c == '`') {
        val start = i; i += 1
        val sb = new StringBuilder
        while (i < n && sql.charAt(i) != c) { sb += sql.charAt(i); i += 1 }
        if (i >= n) throw SqlParseException("unterminated quoted identifier", start)
        i += 1
        out += TQuoted(sb.toString, start)
      } else if (c.isDigit || (c == '.' && peek(1).isDigit)) {
        val start = i
        while (i < n && (sql.charAt(i).isDigit || sql.charAt(i) == '.')) i += 1
        if (i < n && (sql.charAt(i) == 'e' || sql.charAt(i) == 'E')) {
          var j = i + 1
          if (j < n && (sql.charAt(j) == '+' || sql.charAt(j) == '-')) j += 1
          if (j < n && sql.charAt(j).isDigit) {
            i = j
            while (i < n && sql.charAt(i).isDigit) i += 1
          }
        }
        out += TNum(sql.substring(start, i), start)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
        out += TWord(sql.substring(start, i), start)
      } else {
        val start = i
        val two = if (i + 1 < n) sql.substring(i, i + 2) else ""
        if (Set("<>", "!=", "<=", ">=", "||").contains(two)) { out += TSym(two, start); i += 2 }
        else if ("(),.+-*/%=<>;".indexOf(c) >= 0) { out += TSym(c.toString, start); i += 1 }
        else throw SqlParseException(s"unexpected character '$c'", i)
      }
    }
    out += TEnd(if (n == 0) 0 else n - 1)
    out.toVector
  }

  // --------------------------------------------------------------- parser
  private final class P(toks: Vector[Tok]) {
    private var i = 0
    private def cur: Tok = toks(i)
    private def advance(): Tok = { val t = cur; i += 1; t }

    private def isWord(s: String): Boolean = cur match {
      case TWord(w, _) => w.equalsIgnoreCase(s)
      case _ => false
    }
    private def eatWord(s: String): Boolean =
      if (isWord(s)) { i += 1; true } else false
    private def expectWord(s: String): Unit =
      if (!eatWord(s)) throw SqlParseException(s"expected $s", cur.pos)
    private def isSym(s: String): Boolean = cur match {
      case TSym(x, _) => x == s
      case _ => false
    }
    private def eatSym(s: String): Boolean =
      if (isSym(s)) { i += 1; true } else false
    private def expectSym(s: String): Unit =
      if (!eatSym(s)) throw SqlParseException(s"expected '$s'", cur.pos)

    private def identTok(): Ident = advance() match {
      case TWord(w, _)   => Ident(w, quoted = false)
      case TQuoted(q, _) => Ident(q, quoted = true)
      case t => throw SqlParseException("expected identifier", t.pos)
    }

    /** Top level: [WITH name AS (query), ...] queryExpr, then EOF. */
    def parseQuery(): Query = {
      val q = parseOne()
      eatSym(";")
      cur match {
        case TEnd(_) =>
        case t => throw SqlParseException(s"unexpected trailing input", t.pos)
      }
      q
    }

    /** `;`-separated statements, reference-parity with sqlglot's
      * multi-statement transpile (etl_pipeline.py:317-324 joins the
      * transpiled statements with newlines). */
    def parseAll(): List[Query] = {
      val out = ListBuffer.empty[Query]
      while (eatSym(";")) () // leading semicolons
      out += parseOne()
      var more = true
      while (more) {
        val sawSep = eatSym(";")
        while (eatSym(";")) ()
        cur match {
          case TEnd(_) => more = false
          case t if !sawSep =>
            throw SqlParseException("unexpected trailing input", t.pos)
          case _ => out += parseOne()
        }
      }
      out.toList
    }

    private def parseOne(): Query = {
      // INSERT INTO tbl [(col, ...)] <query> — the one DML shape a
      // warehouse-migration script routinely carries alongside SELECTs
      val target: Option[InsertTarget] =
        if (eatWord("INSERT")) {
          expectWord("INTO")
          val table = identTok()
          val cols = ListBuffer.empty[Ident]
          // `(` here is ambiguous: a column list vs a parenthesized query
          // body (`INSERT INTO t (SELECT ...)`). Peek past it: SELECT,
          // WITH, or another `(` means the body starts here.
          val colListAhead = isSym("(") && (toks(i + 1) match {
            case TWord(w, _) => !Set("SELECT", "WITH").contains(w.toUpperCase)
            case TSym("(", _) => false
            case _ => true
          })
          if (colListAhead) {
            i += 1
            cols += identTok()
            while (eatSym(",")) cols += identTok()
            expectSym(")")
          }
          Some(InsertTarget(table, cols.toList))
        } else None
      val ctes = ListBuffer.empty[(Ident, QueryExpr)]
      if (eatWord("WITH")) {
        def one(): Unit = {
          val name = identTok()
          expectWord("AS")
          expectSym("(")
          val q = queryExpr()
          expectSym(")")
          ctes += ((name, q))
        }
        one()
        while (eatSym(",")) one()
      }
      Query(ctes.toList, queryExpr(), target)
    }

    /** Set-operator chains over (optionally parenthesized) select blocks.
      * Precedence matches ANSI/Postgres (and sqlglot): INTERSECT binds
      * TIGHTER than UNION/EXCEPT, each level left-associative —
      * `A UNION B INTERSECT C` is `A UNION (B INTERSECT C)`.
      *
      * ANSI fine print: `A UNION B ORDER BY x LIMIT n` orders/limits the
      * WHOLE union. When the final operand arrived WITHOUT parentheses its
      * parseSelect consumed those trailing clauses, so they are hoisted
      * off the right spine onto the SetOp; when it WAS parenthesized the
      * clauses are still in the token stream and are parsed here directly
      * onto the SetOp (`A UNION (SELECT ...) ORDER BY x` is valid ANSI).
      * A parenthesized operand keeps its own inner clauses (they genuinely
      * bind inside the parens). */
    private def queryExpr(): QueryExpr = {
      var l: QueryExpr = null
      var lParen = false
      locally { val (q, p) = intersectChain(); l = q; lParen = p }
      var going = true
      while (going) {
        val op =
          if (eatWord("UNION")) Some(if (eatWord("ALL")) "UNION ALL" else "UNION")
          else if (eatWord("EXCEPT")) Some("EXCEPT")
          else None
        op match {
          case Some(o) =>
            val (r, rParen) = intersectChain()
            l = SetOp(o, l, r)
            lParen = rParen
          case None => going = false
        }
      }
      l match {
        case s: SetOp if !lParen =>
          // trailing clauses were consumed by the right spine's final
          // unparenthesized SELECT — hoist them onto the whole set op
          val (stripped, ob, lim, off) = stripTrailing(s)
          if (ob.nonEmpty || lim.nonEmpty || off.nonEmpty)
            stripped.asInstanceOf[SetOp].copy(orderBy = ob, limit = lim, offset = off)
          else s
        case q if lParen =>
          // final operand parenthesized (SetOp OR plain SELECT): trailing
          // ORDER BY/LIMIT/OFFSET are still in the token stream —
          // `(A UNION B) ORDER BY x` and `(SELECT a FROM t) LIMIT 3` are
          // both valid ANSI and the clauses bind to the whole expression
          val ob = ListBuffer.empty[OrderItem]
          if (eatWord("ORDER")) {
            expectWord("BY")
            ob += orderItem()
            while (eatSym(",")) ob += orderItem()
          }
          val lim = if (eatWord("LIMIT")) Some(numTok("LIMIT count")) else None
          val off = if (eatWord("OFFSET")) Some(numTok("OFFSET count")) else None
          if (ob.isEmpty && lim.isEmpty && off.isEmpty) q
          else attachTrailing(q, ob.toList, lim, off)
        case other => other
      }
    }

    /** Attach trailing clauses parsed AFTER a parenthesized body. When the
      * inner node has no LIMIT/OFFSET of its own the clauses merge onto it
      * (an inner ORDER BY with no limit is immaterial pre-output, so the
      * outer ordering may replace it). When the inner node already limits —
      * `(A UNION B LIMIT 3) ORDER BY x` must order the 3 limited rows, and
      * `(A ORDER BY y LIMIT 3) LIMIT 2` must re-limit — merging onto one
      * node would silently change which rows survive, so the inner query
      * is wrapped as a derived table and the trailing clauses bind to the
      * wrapper. */
    private def attachTrailing(q: QueryExpr, ob: List[OrderItem],
                               lim: Option[Long], off: Option[Long]): QueryExpr = {
      def wrap(inner: QueryExpr): QueryExpr =
        SelectStmt(List(SelectItem(Star, None)),
          Some(DerivedTable(inner, Ident("_q"))), Nil, None, Nil, None,
          if (ob.nonEmpty) ob else Nil, lim, distinct = false, offset = off)
      q match {
        case s: SetOp if s.limit.isEmpty && s.offset.isEmpty =>
          s.copy(orderBy = if (ob.nonEmpty) ob else s.orderBy,
            limit = lim, offset = off)
        case s: SelectStmt if s.limit.isEmpty && s.offset.isEmpty =>
          s.copy(orderBy = if (ob.nonEmpty) ob else s.orderBy,
            limit = lim, offset = off)
        case inner => wrap(inner)
      }
    }

    /** INTERSECT level (tighter than UNION/EXCEPT). Returns the chain and
      * whether its FINAL operand was parenthesized. */
    private def intersectChain(): (QueryExpr, Boolean) = {
      var (l, lParen) = setOperand()
      while (eatWord("INTERSECT")) {
        val (r, rParen) = setOperand()
        l = SetOp("INTERSECT", l, r)
        lParen = rParen
      }
      (l, lParen)
    }

    /** Remove trailing ORDER BY/LIMIT/OFFSET from the right spine's final
      * SELECT (they lexically trail the whole set op, so ANSI binds them
      * to it). Stops at a SetOp that already carries its own clauses. */
    private def stripTrailing(q: QueryExpr): (QueryExpr, List[OrderItem], Option[Long], Option[Long]) = q match {
      case s: SelectStmt =>
        (s.copy(orderBy = Nil, limit = None, offset = None), s.orderBy, s.limit, s.offset)
      case s @ SetOp(_, _, r, Nil, None, None) =>
        val (r2, ob, lim, off) = stripTrailing(r)
        (s.copy(right = r2), ob, lim, off)
      case other => (other, Nil, None, None)
    }

    private def numTok(what: String): Long = advance() match {
      case TNum(s, _) => s.toLong
      case t => throw SqlParseException(s"expected $what", t.pos)
    }

    private def setOperand(): (QueryExpr, Boolean) =
      if (isSym("(")) {
        i += 1
        val q = queryExpr()
        expectSym(")")
        (q, true)
      } else (parseSelect(), false)

    def parseSelect(): SelectStmt = {
      expectWord("SELECT")
      val distinct = eatWord("DISTINCT")
      val items = ListBuffer(selectItem())
      while (eatSym(",")) items += selectItem()

      var from: Option[FromItem] = None
      val joins = ListBuffer.empty[JoinClause]
      if (eatWord("FROM")) {
        from = Some(fromItem())
        var more = true
        while (more) {
          if (eatWord("LEFT")) { eatWord("OUTER"); expectWord("JOIN"); joins += joined("LEFT JOIN") }
          else if (eatWord("RIGHT")) { eatWord("OUTER"); expectWord("JOIN"); joins += joined("RIGHT JOIN") }
          else if (eatWord("FULL")) { eatWord("OUTER"); expectWord("JOIN"); joins += joined("FULL JOIN") }
          else if (eatWord("CROSS")) { expectWord("JOIN"); joins += JoinClause("CROSS JOIN", fromItem(), None) }
          else if (eatWord("INNER")) { expectWord("JOIN"); joins += joined("JOIN") }
          else if (eatWord("JOIN")) joins += joined("JOIN")
          else more = false
        }
      }
      val where = if (eatWord("WHERE")) Some(expr()) else None
      val groupBy = ListBuffer.empty[SqlExpr]
      if (eatWord("GROUP")) {
        expectWord("BY")
        groupBy += expr()
        while (eatSym(",")) groupBy += expr()
      }
      val having = if (eatWord("HAVING")) Some(expr()) else None
      val orderBy = ListBuffer.empty[OrderItem]
      if (eatWord("ORDER")) {
        expectWord("BY")
        orderBy += orderItem()
        while (eatSym(",")) orderBy += orderItem()
      }
      val limit = if (eatWord("LIMIT")) advance() match {
        case TNum(s, _) => Some(s.toLong)
        case t => throw SqlParseException("expected LIMIT count", t.pos)
      } else None
      val offset = if (eatWord("OFFSET")) advance() match {
        case TNum(s, _) => Some(s.toLong)
        case t => throw SqlParseException("expected OFFSET count", t.pos)
      } else None
      SelectStmt(items.toList, from, joins.toList, where, groupBy.toList,
        having, orderBy.toList, limit, distinct, offset)
    }

    private def joined(kind: String): JoinClause = {
      val t = fromItem()
      expectWord("ON")
      JoinClause(kind, t, Some(expr()))
    }

    private def fromItem(): FromItem =
      if (isSym("(")) {
        i += 1
        val q = queryExpr()
        expectSym(")")
        eatWord("AS")
        DerivedTable(q, identTok())
      } else {
        val name = identTok()
        val alias = cur match {
          case TWord(w, _) if w.equalsIgnoreCase("AS") =>
            i += 1; Some(identTok())
          case TWord(w, _) if !Keywords.clauseStarters(w.toUpperCase) =>
            Some(identTok())
          case _ => None
        }
        TableRef(name, alias)
      }

    private def selectItem(): SelectItem = {
      val e = expr()
      val alias = cur match {
        case TWord(w, _) if w.equalsIgnoreCase("AS") =>
          i += 1; Some(identTok())
        case TWord(w, _) if !Keywords.clauseStarters(w.toUpperCase) =>
          Some(identTok())
        case TQuoted(_, _) => Some(identTok())
        case _ => None
      }
      SelectItem(e, alias)
    }

    private def orderItem(): OrderItem = {
      val e = expr()
      val desc = if (eatWord("DESC")) true else { eatWord("ASC"); false }
      OrderItem(e, desc)
    }

    // expression precedence:
    //   OR < AND < NOT < predicate < || < add < mul < unary
    // `||` gets a dedicated level BELOW +/- because Postgres (the declared
    // read dialect) puts "any other operator" — including || — between
    // `+ -` and the predicate keywords: `a || b + 1` reads as
    // `a || (b + 1)`, not `(a || b) + 1`. SqlDialects.precOf mirrors this.
    def expr(): SqlExpr = orExpr()

    private def orExpr(): SqlExpr = {
      var l = andExpr()
      while (eatWord("OR")) l = BinOp("OR", l, andExpr())
      l
    }
    private def andExpr(): SqlExpr = {
      var l = notExpr()
      while (eatWord("AND")) l = BinOp("AND", l, notExpr())
      l
    }
    private def notExpr(): SqlExpr =
      if (eatWord("NOT")) UnaryOp("NOT", notExpr()) else predicate()

    private def predicate(): SqlExpr = {
      val l = concatExpr()
      if (isSym("=") || isSym("<>") || isSym("!=") || isSym("<") ||
          isSym("<=") || isSym(">") || isSym(">=")) {
        val TSym(op0, _) = advance(): @unchecked
        val op = if (op0 == "!=") "<>" else op0
        BinOp(op, l, concatExpr())
      } else if (isWord("BETWEEN") || isWord("NOT")) {
        val negated = isWord("NOT") && {
          // only treat NOT as predicate prefix for NOT BETWEEN/IN/LIKE
          toks(i + 1) match {
            case TWord(w, _) => Set("BETWEEN", "IN", "LIKE").contains(w.toUpperCase)
            case _ => false
          }
        }
        if (negated) i += 1
        if (eatWord("BETWEEN")) {
          val lo = concatExpr(); expectWord("AND"); val hi = concatExpr()
          Between(l, lo, hi, negated)
        } else if (eatWord("IN")) {
          inTail(l, negated)
        } else if (eatWord("LIKE")) {
          Like(l, concatExpr(), negated)
        } else l // bare trailing NOT belongs to an outer construct
      } else if (eatWord("IN")) {
        inTail(l, negated = false)
      } else if (eatWord("LIKE")) {
        Like(l, concatExpr())
      } else if (eatWord("IS")) {
        val negated = eatWord("NOT")
        expectWord("NULL")
        IsNull(l, negated)
      } else l
    }

    /** `IN (` already consumed: a SELECT body makes it an [[InSubquery]],
      * anything else the literal-list [[InList]]. */
    private def inTail(l: SqlExpr, negated: Boolean): SqlExpr = {
      expectSym("(")
      if (isWord("SELECT")) {
        val q = queryExpr()
        expectSym(")")
        InSubquery(l, q, negated)
      } else {
        val items = ListBuffer(expr())
        while (eatSym(",")) items += expr()
        expectSym(")")
        InList(l, items.toList, negated)
      }
    }

    private def concatExpr(): SqlExpr = {
      var l = addExpr()
      while (eatSym("||")) l = BinOp("||", l, addExpr())
      l
    }
    private def addExpr(): SqlExpr = {
      var l = mulExpr()
      var going = true
      while (going) {
        if (eatSym("+")) l = BinOp("+", l, mulExpr())
        else if (eatSym("-")) l = BinOp("-", l, mulExpr())
        else going = false
      }
      l
    }
    private def mulExpr(): SqlExpr = {
      var l = unary()
      var going = true
      while (going) {
        if (eatSym("*")) l = BinOp("*", l, unary())
        else if (eatSym("/")) l = BinOp("/", l, unary())
        else if (eatSym("%")) l = BinOp("%", l, unary())
        else going = false
      }
      l
    }
    private def unary(): SqlExpr =
      if (eatSym("-")) UnaryOp("-", unary())
      else if (eatSym("+")) unary()
      else primary()

    private def primary(): SqlExpr = cur match {
      case TNum(s, _) => i += 1; NumberLit(s)
      case TStr(s, _) => i += 1; StringLit(s)
      case TSym("(", _) if isWordAt(i + 1, "SELECT") =>
        // scalar subquery in expression position: (SELECT ...) [UNION ...]
        i += 1; val q = queryExpr(); expectSym(")"); ScalarSubquery(q)
      case TSym("(", _) =>
        i += 1; val e = expr(); expectSym(")"); e
      case TSym("*", _) => i += 1; Star
      case TQuoted(q, _) =>
        i += 1
        colTail(Ident(q, quoted = true))
      case TWord(w, p) =>
        val up = w.toUpperCase
        up match {
          case "TRUE"  => i += 1; BoolLit(true)
          case "FALSE" => i += 1; BoolLit(false)
          case "NULL"  => i += 1; NullLit
          case "TIMESTAMP" if isStrAt(i + 1) =>
            i += 1; val TStr(s, _) = advance(): @unchecked; TimestampLit(s)
          case "DATE" if isStrAt(i + 1) =>
            i += 1; val TStr(s, _) = advance(): @unchecked; DateLit(s)
          case "INTERVAL" => i += 1; interval()
          case "CAST" =>
            i += 1; expectSym("(")
            val e = expr()
            expectWord("AS")
            val c = castType(e)
            expectSym(")")
            c
          case "CASE" => i += 1; caseWhen()
          case "EXISTS" if isSymAt(i + 1, "(") =>
            i += 1; expectSym("(")
            val q = queryExpr()
            expectSym(")")
            Exists(q)
          case "EXTRACT" if isSymAt(i + 1, "(") =>
            i += 1; expectSym("(")
            val field = (advance() match {
              case TWord(f, _) => f.toUpperCase
              case t => throw SqlParseException("expected EXTRACT field", t.pos)
            })
            expectWord("FROM")
            val src = expr()
            expectSym(")")
            Extract(field, src)
          case _ =>
            toks(i + 1) match {
              case TSym("(", _) => funcCall(up)
              case _ if Keywords.clauseStarters(up) =>
                // `SELECT FROM t` must be a syntax error, not a column
                // named FROM — reserved clause words never start an
                // expression in this subset (quote them to use as columns)
                throw SqlParseException(s"expected expression, found $up", p)
              case _ =>
                i += 1
                colTail(Ident(w, quoted = false))
            }
        }
      case t => throw SqlParseException("expected expression", t.pos)
    }

    private def isStrAt(k: Int): Boolean = toks(k) match {
      case TStr(_, _) => true
      case _ => false
    }
    private def isSymAt(k: Int, s: String): Boolean = toks(k) match {
      case TSym(x, _) => x == s
      case _ => false
    }
    private def isWordAt(k: Int, s: String): Boolean = toks(k) match {
      case TWord(x, _) => x.equalsIgnoreCase(s)
      case _ => false
    }

    private def colTail(first: Ident): SqlExpr =
      if (isSym(".")) {
        i += 1
        ColRef(Some(first), identTok())
      } else ColRef(None, first)

    /** Postgres `INTERVAL '24 hours'`, ANSI `INTERVAL '24' HOUR`, or the
      * MySQL/BigQuery unquoted `INTERVAL 24 HOUR`. */
    private def interval(): SqlExpr = {
      cur match {
        case TNum(n, _) =>
          i += 1
          cur match {
            case TWord(u, p) if Keywords.intervalUnits(u.toUpperCase.stripSuffix("S")) =>
              i += 1
              return IntervalLit(n, normUnit(u, p))
            case t => throw SqlParseException("interval quantity needs a unit", t.pos)
          }
        case _ =>
      }
      val TStr(s, p) = (cur match {
        case t @ TStr(_, _) => i += 1; t
        case t => throw SqlParseException("expected interval literal", t.pos)
      }): @unchecked
      val inline = s.trim.split("\\s+")
      if (inline.length == 2)
        IntervalLit(inline(0), normUnit(inline(1), p))
      else cur match {
        case TWord(u, _) if Keywords.intervalUnits(u.toUpperCase.stripSuffix("S")) =>
          i += 1; IntervalLit(s.trim, normUnit(u, p))
        case _ if inline.length == 1 =>
          throw SqlParseException("interval literal needs a unit", p)
        case t => throw SqlParseException("malformed interval literal", t.pos)
      }
    }
    private def normUnit(u: String, pos: Int): String = {
      val s = u.toUpperCase.stripSuffix("S")
      if (!Keywords.intervalUnits(s)) throw SqlParseException(s"unknown interval unit '$u'", pos)
      s
    }

    private def castType(e: SqlExpr): Cast = {
      val TWord(t0, p) = (cur match {
        case t @ TWord(_, _) => i += 1; t
        case t => throw SqlParseException("expected type name", t.pos)
      }): @unchecked
      var tpe = t0.toUpperCase
      if (tpe == "DOUBLE" && eatWord("PRECISION")) tpe = "DOUBLE"
      if (!Keywords.castTypes(tpe)) throw SqlParseException(s"unsupported cast type '$t0'", p)
      val args = ListBuffer.empty[Int]
      if (eatSym("(")) {
        def num(): Int = advance() match {
          case TNum(s, _) => s.toInt
          case t => throw SqlParseException("expected precision", t.pos)
        }
        args += num()
        while (eatSym(",")) args += num()
        expectSym(")")
      }
      Cast(e, tpe, args.toList)
    }

    private def caseWhen(): SqlExpr = {
      val operand = if (isWord("WHEN")) None else Some(expr())
      val branches = ListBuffer.empty[(SqlExpr, SqlExpr)]
      while (eatWord("WHEN")) {
        val c = expr(); expectWord("THEN"); val v = expr()
        branches += ((c, v))
      }
      if (branches.isEmpty) throw SqlParseException("CASE needs at least one WHEN", cur.pos)
      val otherwise = if (eatWord("ELSE")) Some(expr()) else None
      expectWord("END")
      CaseWhen(operand, branches.toList, otherwise)
    }

    private def funcCall(name: String): SqlExpr = {
      i += 1 // name
      expectSym("(")
      val base = if (eatSym(")")) FuncCall(name, Nil) else {
        val distinct = eatWord("DISTINCT")
        val args = ListBuffer(expr())
        while (eatSym(",")) args += expr()
        expectSym(")")
        FuncCall(name, args.toList, distinct)
      }
      if (eatWord("OVER")) base.copy(over = Some(windowSpec())) else base
    }

    /** OVER ([PARTITION BY e, ...] [ORDER BY o, ...] [frame]). The frame
      * grammar is the ROWS/RANGE BETWEEN core — identical across all
      * seven targets, so it round-trips verbatim. */
    private def windowSpec(): WindowSpec = {
      expectSym("(")
      val parts = ListBuffer.empty[SqlExpr]
      if (eatWord("PARTITION")) {
        expectWord("BY")
        parts += expr()
        while (eatSym(",")) parts += expr()
      }
      val ord = ListBuffer.empty[OrderItem]
      if (eatWord("ORDER")) {
        expectWord("BY")
        ord += orderItem()
        while (eatSym(",")) ord += orderItem()
      }
      val frame =
        if (isWord("ROWS") || isWord("RANGE")) {
          val TWord(unit0, _) = advance(): @unchecked
          val unit = unit0.toUpperCase
          expectWord("BETWEEN")
          val lo = frameBound()
          expectWord("AND")
          val hi = frameBound()
          Some((unit, lo, hi))
        } else None
      expectSym(")")
      WindowSpec(parts.toList, ord.toList, frame)
    }

    private def frameBound(): String =
      if (eatWord("UNBOUNDED")) {
        if (eatWord("PRECEDING")) "UNBOUNDED PRECEDING"
        else { expectWord("FOLLOWING"); "UNBOUNDED FOLLOWING" }
      } else if (eatWord("CURRENT")) {
        expectWord("ROW"); "CURRENT ROW"
      } else cur match {
        case TNum(n, _) =>
          i += 1
          if (eatWord("PRECEDING")) s"$n PRECEDING"
          else { expectWord("FOLLOWING"); s"$n FOLLOWING" }
        case t => throw SqlParseException("expected frame bound", t.pos)
      }
  }

  private[sql] object Keywords {
    /** Words that end an alias-less select item / table ref. */
    val clauseStarters: Set[String] = Set(
      "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "JOIN", "LEFT",
      "RIGHT", "FULL", "INNER", "CROSS", "ON", "AND", "OR", "NOT", "AS",
      "UNION", "EXCEPT", "INTERSECT", "ASC", "DESC", "BETWEEN", "IN",
      "LIKE", "IS", "WHEN", "THEN", "ELSE", "END", "SELECT", "OFFSET")
    val intervalUnits: Set[String] = Set(
      "SECOND", "MINUTE", "HOUR", "DAY", "WEEK", "MONTH", "QUARTER", "YEAR")
    val castTypes: Set[String] = Set(
      "SMALLINT", "INT", "INTEGER", "BIGINT", "FLOAT", "REAL", "DOUBLE",
      "DECIMAL", "NUMERIC", "VARCHAR", "CHAR", "TEXT", "STRING", "BOOLEAN",
      "DATE", "TIMESTAMP",
      // target-dialect spellings, so every generator's emission re-parses
      // (BigQuery FLOAT64/INT64/BIGNUMERIC/BOOL, MySQL SIGNED)
      "FLOAT64", "INT64", "BIGNUMERIC", "BOOL", "SIGNED")
  }

  /** Parse one statement ([WITH ...] select/set-op); throws
    * [[SqlParseException]]. */
  def parse(sql: String): Query = new P(tokenize(sql)).parseQuery()

  /** Parse a `;`-separated script into its statements. */
  def parseAll(sql: String): List[Query] = new P(tokenize(sql)).parseAll()

  /** Parse a standalone scalar expression (used by tests/builder). */
  def parseExpr(sql: String): SqlExpr = new P(tokenize(sql)).expr()
}
