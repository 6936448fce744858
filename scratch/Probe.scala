package scratch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.llm.Dedup

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val arriving = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
    // pure wide-sig cost on the arriving batch
    for (r <- 0 until 3) {
      val t0 = System.nanoTime()
      Dedup.simhashWideFrame(arriving, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
      println(f"PROBE rep=$r sig_only=${(System.nanoTime()-t0)/1e9}%.3f")
    }
    for (nb <- Seq(4, 16)) {
      val path = s"/tmp/wsprobe_nb$nb"
      Dedup.writeSimhashWideIndex(docs, "doc_id", "text", 7, nb, path)
      for (r <- 0 until 3) {
        val t0 = System.nanoTime()
        graft.streaming.Streams.nearDupGateBatch(spark, path, arriving,
          "doc_id", "text", 7, nb)
          .write.format("noop").mode("overwrite").save()
        println(f"PROBE nb=$nb rep=$r gate=${(System.nanoTime()-t0)/1e9}%.3f")
      }
      // raw index scan cost (full read, no probe)
      for (r <- 0 until 2) {
        val t0 = System.nanoTime()
        spark.read.parquet(path).write.format("noop").mode("overwrite").save()
        println(f"PROBE nb=$nb rep=$r fullscan=${(System.nanoTime()-t0)/1e9}%.3f")
      }
    }
    spark.stop()
  }
}
