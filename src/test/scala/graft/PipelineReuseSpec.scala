package graft

import graft.dedup.FrameStore

/** Artifact-reuse contract for the composed passage-graph pipeline:
  * the first run publishes its stage artifacts (shingle counts, passage
  * graph, LPA labels) to the session [[FrameStore]]; a second run feeds
  * from them — and MUST produce the identical result, so reuse is a pure
  * cost optimization, never a semantic one. */
class PipelineReuseSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("passage graph: artifact-fed rerun equals inline run") {
    FrameStore.clear(spark)
    val q = SparkEntry.queries("pipeline_passage_graph")
    val inline = q(spark, dir).collect().toSeq
    assert(FrameStore.contains(spark, s"passage_nbrs|$dir"),
      "first run must publish the passage graph")
    assert(FrameStore.contains(spark, s"passage_lpa4|$dir"),
      "first run must publish the LPA labels")
    val fed = q(spark, dir).collect().toSeq
    assert(fed == inline)
    assert(inline.nonEmpty)
    FrameStore.clear(spark)
  }
}
