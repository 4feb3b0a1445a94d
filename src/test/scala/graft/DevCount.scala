package graft
/** Dev-only registry counter (test scope, like the DevProbe files). */
object DevCount extends App {
  val q = SparkEntry.queries.keySet
  val o = SparkEntry.oracleSql.keySet
  println(s"COUNT queries=${q.size} oracles=${o.size}")
  println("COUNT noOracle=" + (q -- o).toSeq.sorted.mkString(","))
}
