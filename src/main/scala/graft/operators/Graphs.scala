package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph analytics over edge lists (the co-occurrence graphs the dedup /
  * basket tiers already build). Connected components live in
  * [[Dedup.connectedComponents]]; this hosts the rank/propagation family.
  */
object Graphs {

  /** Deterministic PageRank over an UNDIRECTED edge list (a, b) — fixed
    * iteration count, no convergence test, so results are reproducible
    * run-to-run and replayable by the oracle's recursive CTE.
    *
    * Per round: one hash join (ranks onto edge sources) + one aggregation
    * (contribution sums per destination) — the standard linear-per-round
    * shape; superseded round blocks are released deterministically, same
    * loop discipline as connectedComponents. Every node of an undirected
    * edge list has degree ≥ 1, so there is no dangling-mass term. The node
    * count is collected once (metadata-scale, like a fixture bound) and
    * folded into the teleport literal.
    */
  def pageRank(
      edges: DataFrame,
      iters: Int = 10,
      damping: Double = 0.85): DataFrame = {
    val ee = edges.select(col("a").cast("long").as("src"), col("b").cast("long").as("dst"))
      .union(edges.select(col("b").cast("long").as("src"), col("a").cast("long").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = ee.groupBy("src").agg(count(lit(1)).as("d"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = deg.count()
    if (n == 0) {
      ee.unpersist(); deg.unpersist()
      return edges.sparkSession.emptyDataFrame
        .withColumn("node", lit(0L)).withColumn("rank", lit(0.0)).limit(0)
    }
    // Each round references the previous ranks exactly ONCE, so the whole
    // iteration composes into a single linear-depth lazy plan — one job
    // with `iters` sequential shuffle stages, instead of a job (and its
    // scheduling + materialization cost) per round. Contrast bfsDepths,
    // whose round references state twice and MUST materialize per round to
    // avoid exponential plan blowup. The final checkpoint executes the
    // composed plan once and frees the edge/degree blocks.
    //
    // Shuffle width is sized to the MEASURED edge count for the duration
    // of the (eager) execution: an iterative plan multiplies per-stage
    // overhead by `iters`, so a 3k-edge graph must not pay the session's
    // batch shuffle width 10 times over, while a billion-edge graph gets
    // its parallelism back from the same formula.
    val m = ee.count()
    val sess = edges.sparkSession
    val prevParts = sess.conf.get("spark.sql.shuffle.partitions")
    val parts = math.max(1L, math.min(prevParts.toLong, m / 500000L + 1)).toString
    sess.conf.set("spark.sql.shuffle.partitions", parts)
    try {
      var ranks = deg.select(col("src").as("node"), lit(1.0 / n).as("rank"))
      var iter = 0
      while (iter < iters) {
        ranks = ee.join(ranks, ee("src") === ranks("node"))
          .join(deg, "src")
          .select(col("dst"), (col("rank") / col("d")).as("c"))
          .groupBy(col("dst").as("node"))
          .agg((lit((1 - damping) / n) + lit(damping) * sum("c")).as("rank"))
        iter += 1
      }
      val out = ranks.localCheckpoint(true)
      deg.unpersist(); ee.unpersist()
      out
    } finally sess.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** BFS depths from `source` over an UNDIRECTED edge list (a, b), capped
    * at `maxHops` — fixed round count (deterministic, oracle-replayable by
    * a UNION-deduped recursive CTE) rather than a convergence test. Each
    * round is one hash join + one min-aggregation; the working set is
    * bounded by (reachable nodes), never by path count, because the
    * min-dist aggregation dedups every round. Unreachable-within-cap nodes
    * are absent from the result.
    */
  def bfsDepths(
      edges: DataFrame,
      source: Long,
      maxHops: Int = 6): DataFrame = {
    val ee = edges.select(col("a").cast("long").as("src"), col("b").cast("long").as("dst"))
      .union(edges.select(col("b").cast("long").as("src"), col("a").cast("long").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // same measured-width sizing as pageRank: per-round eager jobs must
    // not pay the batch shuffle width on a small frontier.
    val m = ee.count()
    val sess = edges.sparkSession
    val prevParts = sess.conf.get("spark.sql.shuffle.partitions")
    sess.conf.set("spark.sql.shuffle.partitions",
      math.max(1L, math.min(prevParts.toLong, m / 500000L + 1)).toString)
    try {
      var state = sess.range(1)
        .select(lit(source).as("node"), lit(0L).as("dist"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var iter = 0
      while (iter < maxHops) {
        val next = state.join(ee, state("node") === ee("src"))
          .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
          .union(state)
          .groupBy("node").agg(min("dist").as("dist"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        state.unpersist()
        state = next
        iter += 1
      }
      val out = state.localCheckpoint(true)
      state.unpersist(); ee.unpersist()
      out
    } finally sess.conf.set("spark.sql.shuffle.partitions", prevParts)
  }
}
