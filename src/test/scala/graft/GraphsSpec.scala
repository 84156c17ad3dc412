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

  test("labelPropagation: bridged cliques are one component but two communities") {
    // two 4-cliques {1..4} and {11..14} joined by the single bridge 4–11:
    // reachability (CC) sees ONE class; density (LPA) must keep TWO —
    // inside a clique the min label wins round 1 and unanimity holds it,
    // while the bridge endpoints each see only one foreign vote.
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(11L, 12L, 13L, 14L))
      :+ ((4L, 11L))).toDF("a", "b")
    val labels = Graphs.labelPropagation(edges, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).map(labels).toSet.size == 1,
      s"left clique fragmented: $labels")
    assert(Seq(11L, 12L, 13L, 14L).map(labels).toSet.size == 1,
      s"right clique fragmented: $labels")
    assert(labels(1L) != labels(11L),
      s"bridge edge merged the two communities: $labels")
    // determinism: a second run is byte-identical (ties break on label id)
    assert(Graphs.labelPropagation(edges, iters = 4)
      .as[(Long, Long)].collect().toMap == labels)
  }

  test("iterative loops never touch the caller session's shuffle width") {
    // The loops size their shuffle width in a CHILD session; a concurrent
    // planner on the caller's session must never observe a mutated width.
    // Poll the conf continuously while pageRank runs on another thread —
    // the old conf-mutating implementation set it to "1" for the whole
    // run, so any poll landing inside the loop catches a regression.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val edges = (1L to 2000L).map(i => (i, i % 97 + 10000L)).toDF("a", "b")
    val run = Future(Graphs.pageRank(edges, iters = 8))
    val seen = scala.collection.mutable.Set.empty[String]
    while (!run.isCompleted) {
      seen += spark.conf.get("spark.sql.shuffle.partitions")
      Thread.sleep(5)
    }
    val out = Await.result(run, 120.seconds)
    assert(seen.subsetOf(Set(before)), s"caller width mutated mid-run: $seen")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    // result is re-rooted under the caller's session, so downstream plans
    // over it use the caller's conf, not the loop's measured width
    assert(out.sparkSession eq spark)
    assert(out.count() > 0)
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

  test("kCore peels cascades (pendant chain falls node by node); high k empties") {
    // triangle 1-2-3 plus pendant chain 3-4-5: node 5 (deg 1) peels first,
    // which drops 4 to deg 1 — a 2-round cascade a one-shot degree filter
    // would miss (it would keep 4, whose counted neighbor 5 is gone)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val core = Graphs.kCore(edges, k = 2).orderBy("node")
      .as[(Long, Long)].collect().toSeq
    assert(core == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // no 3-core exists: the triangle's within-core degrees are all 2
    assert(Graphs.kCore(edges, k = 3).isEmpty)
    // deterministic: identical on re-run
    val again = Graphs.kCore(edges, k = 2).orderBy("node")
      .as[(Long, Long)].collect().toSeq
    assert(again == core)
  }
}
