package scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Similarity
import graft.model.Tables

/** Round-17 COUNTERFACTUAL probe: the recall the round-16 posture
  * (auto planes, FIXED numTables=4) would measure at this SF — the
  * "before" number beside llm_lsh_recall_auto's compensated "after".
  * Builds a one-off 4-table layout at the corpus-derived plane count
  * and runs the same rotated-pair / brute-truth contract.
  */
object Fixed4Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    val planes = Similarity.lshPlanesAuto(emb.count())
    val fix = s"/tmp/graft_fixed4_probe_$planes"
    if (!new java.io.File(s"$fix/_SUCCESS").exists())
      Similarity.writeLshIndexAuto(emb, "vec_id", "embedding", path = fix,
        numTables = 4)
    val rc = lit(0.96); val rs = lit(0.28)
    val arriving = emb
      .filter(col("vec_id") % 3 === 1 && col("vec_id") < 20000L)
      .select((col("vec_id") + 50000L).as("vec_id"), col("embedding"))
      .withColumn("vd", transform(col("embedding"), x => x.cast("double")))
      .withColumn("embedding", transform(col("vd"), (x, i) =>
        when(i % 2 === 0,
          x * rc - element_at(col("vd"), i + lit(2)) * rs)
        .otherwise(element_at(col("vd"), i) * rs + x * rc)))
      .select("vec_id", "embedding")
    val truth = Similarity.rangeSearch(emb, arriving,
      "vec_id", "embedding", minCos = 0.9)
    val hits = Similarity.probeLshThreshold(spark, fix, arriving,
      "vec_id", "embedding", threshold = 0.9, numPlanes = planes,
      numTables = 4)
      .select(col("query_id"), col("cand_id"), lit(1).as("hit"))
    val gate = col("cos") >= 0.95
    val r = truth.join(hits, Seq("query_id", "cand_id"), "left")
      .select(col("cos"), coalesce(col("hit"), lit(0)).as("hit"))
      .agg(count(lit(1)).as("n_truth"),
        sum(when(gate, 1).otherwise(0)).cast("long").as("n_truth_gate"),
        sum(when(gate, col("hit")).otherwise(0)).cast("long").as("n_hit_gate"))
      .collect()(0)
    val recall = r.getLong(2).toDouble / r.getLong(1)
    println(s"PROBE fixed4 sf=$sfDir planes=$planes tables=4 " +
      s"n_truth_gate=${r.getLong(1)} n_hit_gate=${r.getLong(2)} " +
      f"recall_gate=$recall%.4f")
    spark.stop()
  }
}
