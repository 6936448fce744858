package scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 probe: dump the wide first-frame video hashes of the
  * synthetic sf10 corpus to parquet (plus the banded pair count), to
  * attribute the llm_video_dedup_clusters_wide non-convergence at
  * sf10 — is the pair graph degenerate (fixture entropy) or is the
  * closure's round budget the problem?
  */
object VideoHashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"))
    val hashes = graft.llm.Multimodal.extractVideoFrameHashesWide(
      graft.llm.Multimodal.syntheticVideoGroups(docs, "doc_id")).toDF()
    hashes.write.mode("overwrite").parquet("/tmp/vhash_probe")
    val h = spark.read.parquet("/tmp/vhash_probe")
    println(s"PROBE n_videos=${h.count()}")
    println(s"PROBE distinct_sigs=${h.select("dhash", "vhash").distinct().count()}")
    val pairs = graft.llm.Dedup.hammingNearDupPairsWide(h, "media_id",
      "dhash", "vhash", nLoBits = 56, nHiBits = 54, maxHamming = 7)
    pairs.write.mode("overwrite").parquet("/tmp/vpairs_probe")
    println(s"PROBE n_pairs=${spark.read.parquet("/tmp/vpairs_probe").count()}")
    spark.stop()
  }
}
