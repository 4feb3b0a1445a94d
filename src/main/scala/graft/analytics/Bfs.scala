package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-depth multi-source BFS over an edge list — the third iterative
  * graph family beside [[graft.dedup.Dedup.connectedComponents]] ("which
  * rows are the same thing") and [[PageRank]] ("which nodes matter"):
  * this answers "how far is every node from a seed set", the k-hop
  * neighbourhood primitive behind blast-radius queries, crawl-frontier
  * scheduling, and taint propagation from flagged sources.
  *
  * Each level is one keyed join (frontier → neighbours) + one distinct +
  * one anti-join against the settled set — all sharded on the node id,
  * nothing driver-bound. The frontier and settled frames are
  * `localCheckpoint`ed per level: BFS lineage otherwise nests one
  * anti-join per level and re-executes the whole prefix at every action
  * (the same eager-truncation trade [[graft.queries.DistributedRolling]]
  * documents; use the durable-snapshot variant's pattern for multi-hour
  * frontier jobs).
  *
  * The depth bound is part of the CONTRACT, not a shortcut: "within
  * maxHops" is the production question (unbounded BFS on a 100 TB graph
  * is a diameter-length job chain), and the bound makes the DuckDB twin
  * — a depth-limited recursive CTE, a genuinely different evaluation
  * strategy — exact, so the registry entry is hash-checkable.
  */
object Bfs {

  /** Min-hop distance from any source within `maxHops` hops. `nbrs` must
    * carry DIRECTED (u, v) rows (callers wanting undirected semantics
    * pass both directions); `sources` carries `id`. Returns (id, dist)
    * for reached nodes only — dist in [0, maxHops]. */
  def run(nbrs: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0: $maxHops")
    var settled = sources.select(col("id"), lit(0).as("dist"))
      .distinct().localCheckpoint(true)
    var frontier = settled
    for (i <- 1 to maxHops) {
      val next = frontier.join(nbrs, frontier("id") === nbrs("u"))
        .select(col("v").as("id")).distinct()
        .join(settled, Seq("id"), "left_anti")
        .select(col("id"), lit(i).as("dist"))
        .localCheckpoint(true)
      settled = settled.union(next).localCheckpoint(true)
      frontier = next
    }
    settled
  }
}
