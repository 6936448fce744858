package scratch

import org.apache.spark.sql.{SparkSession, functions => F}
import graft.llm.Similarity
import graft.model.Tables
import graft.queries.LlmQueries

object RangeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val emb = Tables.embeddings(spark, dir)
      val q = emb.filter(F.col("vec_id") < 10)
      val brute = Similarity.rangeSearch(emb, q, "vec_id", "embedding", 0.25)
      val fix = LlmQueries.ensureIvfIndex(spark, dir)
      val approx = Similarity.ivfRangeFromIndex(spark, fix, q, "vec_id",
        "embedding", 0.25, nProbe = 5)
      val bn = brute.groupBy("query_id").agg(F.count(F.lit(1)).as("bn"))
      val an = approx.groupBy("query_id").agg(F.count(F.lit(1)).as("an"))
      val hits = brute.join(approx, Seq("query_id", "cand_id"), "left_semi")
        .groupBy("query_id").agg(F.count(F.lit(1)).as("nh"))
      val rows = q.select(F.col("vec_id").as("query_id")).distinct()
        .join(bn, Seq("query_id"), "left").join(an, Seq("query_id"), "left")
        .join(hits, Seq("query_id"), "left")
        .select(F.col("query_id"), F.coalesce(F.col("bn"), F.lit(0L)),
          F.coalesce(F.col("an"), F.lit(0L)), F.coalesce(F.col("nh"), F.lit(0L)))
        .collect()
      rows.sortBy(_.getLong(0)).foreach { r =>
        val (b, a, h) = (r.getLong(1), r.getLong(2), r.getLong(3))
        val rec = if (b == 0) 1.0 else h.toDouble / b
        println(f"PROBE sf$sf q${r.getLong(0)} brute=$b approx=$a hits=$h recall=$rec%.3f subset=${h == a}")
      }
    }
    spark.stop()
  }
}
