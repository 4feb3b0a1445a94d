package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.sql._

/** Generative hardening of the transpiler: random well-formed ASTs are
  * emitted and re-parsed across every dialect.
  *
  * Two laws:
  *  1. emit→parse→emit is a FIXED POINT per dialect (pretty-printing is
  *     canonical — a second pass changes nothing);
  *  2. emission in any self-readable dialect re-parses (the parser's read
  *     grammar covers what the generators write; BigQuery/MySQL emissions
  *     re-parse too because the parser accepts their interval spellings
  *     and function forms).
  *
  * Gumbel-random ASTs catch precedence/parenthesization bugs that
  * hand-written goldens never hit (e.g. `a - (b - c)` must keep parens,
  * `(a OR b) AND c` must keep parens, nested CASE inside a function call).
  */
object TranspilerProperties extends Properties("transpiler") {

  private val nameGen: Gen[String] =
    Gen.oneOf("a", "b", "c", "x", "amount", "price", "qty", "ts_col")

  private val leafGen: Gen[SqlExpr] = Gen.oneOf(
    nameGen.map(n => ColRef(None, Ident(n))),
    Gen.chooseNum(0, 999).map(n => NumberLit(n.toString)),
    Gen.oneOf("s", "t", "x%").map(StringLit(_)),
    Gen.const(NullLit),
    Gen.oneOf(true, false).map(BoolLit(_)))

  /** Small single-column subquery for expression positions (round-11:
    * scalar/EXISTS/IN-subquery support). Correlation is just a qualified
    * column reference, so `u.x = t.a` exercises the correlated shape. */
  private val subqueryGen: Gen[QueryExpr] = for {
    col <- nameGen
    correlated <- Gen.oneOf(true, false)
    where <- Gen.option(
      if (correlated)
        Gen.const(BinOp("=", ColRef(Some(Ident("u")), Ident("x")),
          ColRef(Some(Ident("t")), Ident("a"))))
      else predGen(0))
  } yield SelectStmt(List(SelectItem(ColRef(None, Ident(col)), None)),
    Some(TableRef(Ident("u"), None)), Nil, where, Nil, None, Nil, None)

  private def exprGen(depth: Int): Gen[SqlExpr] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      1 -> subqueryGen.map(ScalarSubquery(_)),
      2 -> (for {
        op <- Gen.oneOf("+", "-", "*", "/", "||")
        l <- exprGen(depth - 1); r <- exprGen(depth - 1)
      } yield BinOp(op, l, r)),
      2 -> (for {
        op <- Gen.oneOf("=", "<>", "<", "<=", ">", ">=")
        l <- exprGen(depth - 1); r <- exprGen(depth - 1)
      } yield BinOp(op, l, r)),
      1 -> (for {
        op <- Gen.oneOf("AND", "OR")
        l <- predGen(depth - 1); r <- predGen(depth - 1)
      } yield BinOp(op, l, r)),
      1 -> exprGen(depth - 1).map(UnaryOp("-", _)),
      1 -> (for {
        f <- Gen.oneOf("SUM", "AVG", "MIN", "MAX", "ABS", "ROUND")
        a <- exprGen(depth - 1)
      } yield FuncCall(f, List(a))),
      1 -> (for {
        c <- predGen(depth - 1); t <- exprGen(depth - 1); e <- exprGen(depth - 1)
      } yield CaseWhen(None, List((c, t)), Some(e))),
      1 -> (for {
        e <- exprGen(depth - 1)
        t <- Gen.oneOf("DOUBLE", "BIGINT", "VARCHAR")
      } yield Cast(e, t)))

  private def predGen(depth: Int): Gen[SqlExpr] =
    if (depth <= 0) leafGen.map(l => BinOp(">", l, NumberLit("0")))
    else Gen.frequency(
      3 -> (for {
        op <- Gen.oneOf("=", "<>", "<", ">")
        l <- exprGen(depth - 1); r <- exprGen(depth - 1)
      } yield BinOp(op, l, r)),
      1 -> (for {
        x <- exprGen(depth - 1); lo <- exprGen(depth - 1); hi <- exprGen(depth - 1)
        neg <- Gen.oneOf(true, false)
      } yield Between(x, lo, hi, neg)),
      1 -> (for {
        x <- exprGen(depth - 1)
        items <- Gen.listOfN(2, exprGen(depth - 1))
        neg <- Gen.oneOf(true, false)
      } yield InList(x, items, neg)),
      1 -> exprGen(depth - 1).map(IsNull(_)),
      1 -> subqueryGen.map(Exists(_)),
      1 -> (for {
        x <- exprGen(depth - 1); q <- subqueryGen
        neg <- Gen.oneOf(true, false)
      } yield InSubquery(x, q, neg)),
      1 -> (for {
        op <- Gen.oneOf("AND", "OR")
        l <- predGen(depth - 1); r <- predGen(depth - 1)
      } yield BinOp(op, l, r)),
      1 -> predGen(depth - 1).map(UnaryOp("NOT", _)))

  private val stmtGen: Gen[SelectStmt] = for {
    nItems <- Gen.chooseNum(1, 4)
    items <- Gen.listOfN(nItems, for {
      e <- exprGen(2)
      alias <- Gen.option(Gen.oneOf("v1", "v2", "k", "from").map(Ident(_)))
    } yield SelectItem(e, alias))
    where <- Gen.option(predGen(2))
    grp <- Gen.oneOf(Nil, List(NumberLit("1")),
      List(ColRef(None, Ident("a")), ColRef(None, Ident("b"))))
    having <- if (grp.nonEmpty) Gen.option(predGen(1)) else Gen.const(None)
    ord <- Gen.oneOf(Nil,
      List(OrderItem(ColRef(None, Ident("a")), desc = false)),
      List(OrderItem(NumberLit("1"), desc = true)))
    lim <- Gen.option(Gen.chooseNum(1L, 100L))
  } yield SelectStmt(items, Some(TableRef(Ident("t"), None)), Nil,
    where, grp, having, ord, lim)

  private val dialects = Transpiler.getAllDialects

  property("emit → parse → emit is a fixed point in every dialect") =
    Prop.forAll(stmtGen, Gen.oneOf(dialects)) { (stmt, d) =>
      val gen = new SqlDialects.Generator(SqlDialects.all(d))
      val once = gen.sql(Query(Nil, stmt))
      val reparsed = SqlParser.parse(once)
      val twice = gen.sql(reparsed)
      val ok = once == twice
      if (!ok) println(s"dialect=$d\nonce:\n$once\ntwice:\n$twice")
      ok
    }

  property("postgres emission of a random AST always re-parses") =
    Prop.forAll(stmtGen) { stmt =>
      val pg = new SqlDialects.Generator(SqlDialects.Postgres).sql(Query(Nil, stmt))
      Transpiler.validateSql(pg).isEmpty
    }

  property("cross-dialect: postgres → any dialect text is non-empty and parses") =
    Prop.forAll(stmtGen, Gen.oneOf(dialects)) { (stmt, d) =>
      val pg = new SqlDialects.Generator(SqlDialects.Postgres).sql(Query(Nil, stmt))
      val out = Transpiler.transpile(pg, "postgres", d)
      out.nonEmpty && Transpiler.validateSql(out).isEmpty
    }

  // ------------------------------------------------------------------
  // STRUCTURAL round-trip law: parse(emit_postgres(ast)) == ast.
  // The fixed-point law above cannot see a paren-dropping bug that
  // *stably* re-groups (`a * (b / c)` → `a * b / c` → same text twice);
  // this law can, because the AST comparison notices the re-grouping.
  // ------------------------------------------------------------------

  /** Canonicalize presentation-only details before comparing: the
    * `quoted` flag on identifiers (the emitter must quote reserved words
    * like `from`, so the flag flips on re-parse without changing meaning).
    * Grouping, operators, clause placement — everything structural — is
    * compared exactly. */
  private def norm(q: Query): Query =
    Query(q.ctes.map { case (n, b) => (normI(n), normQE(b)) }, normQE(q.body),
      q.insertInto.map(t => InsertTarget(normI(t.table), t.columns.map(normI))))
  private def normI(i: Ident): Ident = i.copy(quoted = false)
  private def normQE(q: QueryExpr): QueryExpr = q match {
    case s: SelectStmt => s.copy(
      items = s.items.map(it => SelectItem(normE(it.expr), it.alias.map(normI))),
      from = s.from.map(normF), joins = s.joins.map(j =>
        JoinClause(j.kind, normF(j.table), j.on.map(normE))),
      where = s.where.map(normE), groupBy = s.groupBy.map(normE),
      having = s.having.map(normE), orderBy = s.orderBy.map(normO))
    case s: SetOp => s.copy(left = normQE(s.left), right = normQE(s.right),
      orderBy = s.orderBy.map(normO))
  }
  private def normF(f: FromItem): FromItem = f match {
    case TableRef(n, a) => TableRef(normI(n), a.map(normI))
    case DerivedTable(q, a) => DerivedTable(normQE(q), normI(a))
  }
  private def normO(o: OrderItem): OrderItem = OrderItem(normE(o.expr), o.desc)
  private def normW(w: WindowSpec): WindowSpec =
    WindowSpec(w.partitionBy.map(normE), w.orderBy.map(normO), w.frame)
  private def normE(e: SqlExpr): SqlExpr = e match {
    case ColRef(t, c) => ColRef(t.map(normI), normI(c))
    // AND is associative (including under three-valued logic) and the
    // pretty-printer flattens WHERE-level AND chains onto one line per
    // conjunct, so grouping inside a pure AND chain is presentation:
    // canonicalize to a left fold before comparing
    case BinOp("AND", _, _) =>
      def flat(x: SqlExpr): List[SqlExpr] = x match {
        case BinOp("AND", l, r) => flat(l) ++ flat(r)
        case other => List(normE(other))
      }
      flat(e).reduceLeft(BinOp("AND", _, _))
    case BinOp(op, l, r) => BinOp(op, normE(l), normE(r))
    case UnaryOp(op, x) => UnaryOp(op, normE(x))
    case Between(x, lo, hi, n) => Between(normE(x), normE(lo), normE(hi), n)
    case InList(x, items, n) => InList(normE(x), items.map(normE), n)
    case Like(x, p, n) => Like(normE(x), normE(p), n)
    case IsNull(x, n) => IsNull(normE(x), n)
    case CaseWhen(op, br, el) => CaseWhen(op.map(normE),
      br.map { case (c, v) => (normE(c), normE(v)) }, el.map(normE))
    case FuncCall(n, args, d, over) =>
      FuncCall(n, args.map(normE), d, over.map(normW))
    case Cast(x, t, ta) => Cast(normE(x), t, ta)
    case Extract(f, x) => Extract(f, normE(x))
    case other => other
  }

  private val windowGen: Gen[WindowSpec] = for {
    parts <- Gen.oneOf(Nil, List(ColRef(None, Ident("k"))))
    ord <- Gen.oneOf(Nil, List(OrderItem(ColRef(None, Ident("ts_col")), desc = false)))
    frame <- Gen.oneOf(
      None,
      Some(("ROWS", "UNBOUNDED PRECEDING", "CURRENT ROW")),
      Some(("ROWS", "3 PRECEDING", "1 FOLLOWING")),
      Some(("RANGE", "UNBOUNDED PRECEDING", "UNBOUNDED FOLLOWING")))
    // a frame without ORDER BY is degenerate; keep generated specs sane
  } yield WindowSpec(parts, if (frame.isDefined && ord.isEmpty)
      List(OrderItem(ColRef(None, Ident("a")), desc = false)) else ord, frame)

  private val analyticStmtGen: Gen[SelectStmt] = for {
    base <- stmtGen
    w <- windowGen
    fn <- Gen.oneOf("ROW_NUMBER", "SUM", "AVG", "COUNT")
    arg = if (fn == "ROW_NUMBER") Nil else List(ColRef(None, Ident("amount")): SqlExpr)
  } yield base.copy(items =
    SelectItem(FuncCall(fn, arg, distinct = false, over = Some(w)),
      Some(Ident("w0"))) :: base.items)

  private def queryExprGen(depth: Int): Gen[QueryExpr] =
    if (depth <= 0) Gen.frequency(3 -> stmtGen, 1 -> analyticStmtGen)
    else Gen.frequency(
      2 -> stmtGen,
      1 -> analyticStmtGen,
      2 -> (for {
        op <- Gen.oneOf("UNION", "UNION ALL", "INTERSECT", "EXCEPT")
        l <- queryExprGen(depth - 1)
        r <- queryExprGen(depth - 1)
        ord <- Gen.oneOf(Nil, List(OrderItem(NumberLit("1"), desc = true)))
        lim <- Gen.option(Gen.chooseNum(1L, 50L))
        off <- Gen.option(Gen.chooseNum(1L, 10L))
      } yield SetOp(op, l, r, ord, lim, off)))

  private val fullQueryGen: Gen[Query] = for {
    body0 <- queryExprGen(2)
    // a derived table wrapping a set op exercises subqueries-in-FROM
    useDerived <- Gen.oneOf(true, false)
    body <- if (useDerived) queryExprGen(1).map { inner =>
      SelectStmt(List(SelectItem(Star, None)),
        Some(DerivedTable(inner, Ident("sub"))), Nil, None, Nil, None,
        Nil, None): QueryExpr
    } else Gen.const(body0)
    ctes <- Gen.oneOf(
      Nil,
      List((Ident("cte0"), SelectStmt(List(SelectItem(ColRef(None, Ident("a")), None)),
        Some(TableRef(Ident("t"), None)), Nil, None, Nil, None, Nil, None): QueryExpr)))
    ins <- Gen.oneOf(
      None,
      Some(InsertTarget(Ident("sink_table"), Nil)),
      Some(InsertTarget(Ident("sink_table"), List(Ident("c1"), Ident("c2")))))
  } yield Query(ctes, body, ins)

  property("STRUCTURAL: parse(emit_postgres(ast)) == ast (expressions)") =
    Prop.forAll(stmtGen) { stmt =>
      val q = Query(Nil, stmt)
      val pg = new SqlDialects.Generator(SqlDialects.Postgres).sql(q)
      val back = norm(SqlParser.parse(pg))
      val ok = back == norm(q)
      if (!ok) println(s"sql:\n$pg\nexpected: ${norm(q)}\ngot:      $back")
      ok
    }

  property("STRUCTURAL: parse(emit_postgres(ast)) == ast (set ops, CTEs, windows, INSERT)") =
    Prop.forAll(fullQueryGen) { q =>
      val pg = new SqlDialects.Generator(SqlDialects.Postgres).sql(q)
      val back = norm(SqlParser.parse(pg))
      val ok = back == norm(q)
      if (!ok) println(s"sql:\n$pg\nexpected: ${norm(q)}\ngot:      $back")
      ok
    }

  property("STRUCTURAL fixed point survives every dialect (full query gen)") =
    Prop.forAll(fullQueryGen, Gen.oneOf(dialects)) { (q, d) =>
      val gen = new SqlDialects.Generator(SqlDialects.all(d))
      val once = gen.sql(q)
      val twice = gen.sql(SqlParser.parse(once))
      val ok = once == twice
      if (!ok) println(s"dialect=$d\nonce:\n$once\ntwice:\n$twice")
      ok
    }
}
