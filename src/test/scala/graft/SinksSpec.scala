package graft

import org.apache.spark.sql.execution.exchange.Exchange

import graft.sources.Sinks

/** Bucketed-table layout spec: co-located joins must plan without a
  * shuffle (the whole point of paying the bucketed write).
  */
class SinksSpec extends SparkSpec {

  import spark.implicits._

  test("bucketed tables join with no Exchange in the physical plan") {
    val orders = (1L to 200L).map(i => (i % 40, i)).toDF("custkey", "orderkey")
    val cust = (0L until 40L).map(i => (i, s"c$i")).toDF("custkey", "name")
    Sinks.writeBucketedTable(orders, "b_orders", buckets = 8, bucketCol = "custkey")
    Sinks.writeBucketedTable(cust, "b_cust", buckets = 8, bucketCol = "custkey")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("b_orders").join(spark.table("b_cust"), "custkey")
      val exchanges = joined.queryExecution.executedPlan.collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"bucketed co-located join must not shuffle, found: $exchanges")
      assert(joined.count() == 200)
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
