package graft

import graft.operators.Graphs

/** Semantics the graph-query oracles can't isolate: mass conservation,
  * centrality ordering, and the BFS hop cap.
  */
class GraphsSpec extends SparkSpec {

  import spark.implicits._

  test("pageRank conserves probability mass and ranks the path center highest") {
    // path graph 1–2–3: symmetric, so ranks of 1 and 3 are equal and the
    // center (2) dominates; total mass stays 1 (no dangling nodes).
    val out = Graphs.pageRank(Seq((1L, 2L), (2L, 3L)).toDF("a", "b"), iters = 10)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    assert(math.abs(out(1L) - out(3L)) < 1e-12)
    assert(out(2L) > out(1L))
  }

  test("bfsDepths reports exact hop counts and honors the cap") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val full = Graphs.bfsDepths(chain, source = 1L, maxHops = 6)
      .as[(Long, Long)].collect().toMap
    assert(full == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    val capped = Graphs.bfsDepths(chain, source = 1L, maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(capped == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }
}
