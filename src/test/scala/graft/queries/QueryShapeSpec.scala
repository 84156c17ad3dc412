package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structural invariants of the newest query-tier entries — properties the
  * DuckDB hash-compare can't see (it pins equality, not WHY the answer is
  * right).
  */
class QueryShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("tx_chunk_overlap: chunks tile every document with stride-24 starts") {
    import spark.implicits._
    val chunks = TextQueries.queries("tx_chunk_overlap")(spark, sf)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        max("start").as("last_start"),
        min("start").as("first_start"),
        sum(when(col("n_toks") === 32, 1).otherwise(0)).as("n_full"))
      .as[(Long, Long, Long, Long, Long)]
      .collect()
    val nToks = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), "\\s+")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (doc, nChunks, lastStart, firstStart, nFull) =>
      val n = nToks(doc)
      assert(firstStart == 0L, s"doc $doc: first chunk must start at 0")
      // starts are 0, 24, 48, … ≤ n-1 ⇒ count = ceil(n/24), so every token
      // index < n is covered by the chunk starting at 24*floor(i/24)
      assert(nChunks == (n + 23) / 24, s"doc $doc: chunk count")
      assert(lastStart == 24L * ((n - 1) / 24), s"doc $doc: last start")
      // all but at most two trailing chunks are full 32-token windows
      assert(nFull >= nChunks - 2, s"doc $doc: full-window count")
    }
  }

  test("q_variant: typed extraction handles missing paths and type casts") {
    import spark.implicits._
    val out = RelationalQueries.queries("q_variant")(spark, sf)
    val row = out.orderBy("event_id").limit(1)
      .select("k_int", "k_str", "k_missing", "v_is_null")
      .as[(Option[Long], Option[String], Option[String], Boolean)]
      .head()
    assert(row._1.isDefined, "k extracts as BIGINT")
    assert(row._2.contains(row._1.get.toString), "string cast of the same path")
    assert(row._3.isEmpty, "missing path yields NULL, not error")
    assert(!row._4, "parsed object is not the JSON null literal")
  }

  test("st_late_data_parity: some stragglers drop, some merge, no duplicate windows") {
    import spark.implicits._
    val out = StreamQueries.queries("st_late_data_parity")(spark, sf)
      .select(col("win_start"), col("n")).as[(String, Long)].collect()
    assert(out.map(_._1).distinct.length == out.length,
      "append mode must emit each finalized window exactly once")
    val total = out.map(_._2).sum
    val all = graft.sources.Tables.load(spark, sf, "events").count()
    val onTime = graft.sources.Tables.load(spark, sf, "events")
      .filter(pmod(col("event_id"), lit(5)) =!= 0).count()
    assert(total < all, "watermark must drop at least one straggler")
    assert(total > onTime, "at least one straggler must merge into a live window")
  }

  test("k11_xml_roundtrip: XML metacharacters survive write+read") {
    val out = ParityQueries.queries("k11_xml_roundtrip")(spark, sf)
    val probes = out.select("xml_probe").collect().map(_.getString(0))
    assert(probes.nonEmpty)
    assert(probes.forall(_.contains(" <&\"'> ")),
      "escaped metacharacters must round-trip verbatim")
  }
}
