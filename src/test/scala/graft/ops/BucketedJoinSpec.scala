package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketedJoinSpec extends SparkSpec {

  test("joining two tables bucketed on the key needs no shuffle Exchange") {
    for (t <- Seq("bkt_orders", "bkt_customer")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    val orders = spark.read.parquet(sf("orders"))
    val customer = spark.read.parquet(sf("customer"))
    Sources.writeBucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "bkt_orders", "o_custkey", 4)
    Sources.writeBucketed(customer.select("c_custkey", "c_mktsegment"),
      "bkt_customer", "c_custkey", 4)
    val joined = spark.table("bkt_orders")
      .join(spark.table("bkt_customer"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle, got:\n$plan")
    // and it is still correct
    val expected = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
    assert(joined.count() === expected)
  }

  test("watermark drops data later than the allowed lateness (append mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{Ev, Streams}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val mem = MemoryStream[Ev]
    val q = Streams.tumblingAgg(mem.toDF(), "15 minutes", "10 minutes")
      .writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    try {
      mem.addData(Ev(t(10, 0), "click", 1, 1.0), Ev(t(10, 5), "click", 1, 1.0))
      q.processAllAvailable()
      // advance the watermark far past the 10:00 window
      mem.addData(Ev(t(12, 0), "click", 1, 1.0))
      q.processAllAvailable()
      // a late event for the already-closed 10:00 window must be DROPPED
      mem.addData(Ev(t(10, 7), "click", 1, 99.0))
      q.processAllAvailable()
      mem.addData(Ev(t(13, 0), "click", 1, 1.0)) // push watermark again
      q.processAllAvailable()
      val w10 = spark.table("wm_test")
        .filter(col("window_start") === t(10, 0)).collect()
      assert(w10.length === 1)
      assert(w10.head.getAs[Long]("n") === 2) // late row not counted
    } finally q.stop()
  }
}
