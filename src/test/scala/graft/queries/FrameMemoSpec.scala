package graft.queries

import graft.SparkSpec

/** The shared-frame memo contract: one build per (session, key), distinct
  * keys isolated, and the same frame object handed to every consumer.
  */
class FrameMemoSpec extends SparkSpec {

  test("getOrCompute builds once per key and returns the same frame") {
    var builds = 0
    def build() = { builds += 1; spark.range(3).toDF() }
    val a1 = FrameMemo.getOrCompute(spark, "memo-spec:a")(build())
    val a2 = FrameMemo.getOrCompute(spark, "memo-spec:a")(build())
    val b = FrameMemo.getOrCompute(spark, "memo-spec:b")(build())
    assert(a1 eq a2, "same key must return the memoized frame")
    assert(builds == 2, s"expected one build per distinct key, got $builds")
    assert(b.count() == 3)
  }
}
