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

  private def exprGen(depth: Int): Gen[SqlExpr] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
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
}
