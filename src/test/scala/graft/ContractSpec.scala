package graft

import graft.queries._

/** Driver-contract shape guards: the query registry is merged from five
  * maps with `++`, where a duplicated name would silently shadow a query —
  * assert the merge is collision-free and the contract invariants hold. */
class ContractSpec extends SparkSpec {

  test("no key collisions across query modules") {
    val parts = Seq(Relational.queries, Relational2.queries,
      Relational3.queries, Relational4.queries, Relational5.queries,
      Relational6.queries, Relational7.queries, Domain.queries,
      Extensions.queries, Behavioral.queries, Sketches.queries,
      Web.queries, Transpile.queries, Probes.queries)
    assert(SparkEntry.queries.size == parts.map(_.size).sum,
      "a query name is duplicated across modules and got shadowed")
  }

  test("every oracle entry has a query; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle without query: $orphans")
    assert(qs.forall(_.matches("[a-z0-9_]+")), qs.filterNot(_.matches("[a-z0-9_]+")))
  }

  test("flagship entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns rows at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, fn) =>
      fn(spark, dir).isEmpty
    }.map(_._1)
    assert(empty.isEmpty, s"empty results at sf0.001: $empty")
  }
}
