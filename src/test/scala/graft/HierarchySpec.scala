package graft

import graft.operators.Hierarchy

/** Semantics the q_hierarchy oracle can't cover: deep-chain doubling,
  * forests, dangling parents, and loud cycle failure.
  */
class HierarchySpec extends SparkSpec {

  import spark.implicits._

  private def flat(edges: Seq[(Long, Option[Long])], maxIter: Int = 40) =
    Hierarchy.flatten(
        edges.toDF("node", "parent"), maxIter = maxIter)
      .as[(Long, Long, Long)].collect().toSet

  test("deep chain resolves to the single root with exact depths") {
    // 0 ← 1 ← 2 ← … ← 20: depth 20 needs only ceil(log2 20) = 5 doubling
    // rounds; maxIter = 6 proves the O(log d) claim (a per-level loop
    // would need 20).
    val chain = (0L to 20L).map(i => (i, if (i == 0) None else Some(i - 1)))
    val out = flat(chain, maxIter = 6)
    assert(out == (0L to 20L).map(i => (i, 0L, i)).toSet)
  }

  test("forest keeps each tree under its own root") {
    val forest = Seq(
      (1L, None), (2L, Some(1L)), (3L, Some(1L)),
      (10L, None), (11L, Some(10L)), (12L, Some(11L)))
    assert(flat(forest) == Set(
      (1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 1L),
      (10L, 10L, 0L), (11L, 10L, 1L), (12L, 10L, 2L)))
  }

  test("dangling parent freezes the subtree instead of dropping it") {
    // 5's parent 99 never appears as a node: 5 keeps (root=99, depth=1)
    // and its child still resolves through it.
    val out = flat(Seq((5L, Some(99L)), (6L, Some(5L))))
    assert(out == Set((5L, 99L, 1L), (6L, 99L, 2L)))
  }

  test("cycle fails loudly at maxIter instead of spinning or lying") {
    val e = intercept[IllegalArgumentException] {
      flat(Seq((1L, Some(2L)), (2L, Some(1L))), maxIter = 5)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("empty edge list yields an empty result") {
    assert(flat(Seq.empty) == Set.empty)
  }
}
