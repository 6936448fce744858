package scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 attribution probe: time each candidate-membership stage of
  * the composed ingest pipeline SEPARATELY at the probe SF, on an
  * arriving set the size of the corpus (the llm_stream_ingest_e2e
  * shape). Answers: which stage makes the e2e row 85x at sf10?
  */
object IngestStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val arriving = docs.join(emb, col("doc_id") === col("vec_id"))
      .select((col("doc_id") + 9000000L).as("doc_id"), col("text"),
        col("embedding"))
    arriving.cache().count()

    val fixRoot = "/tmp/ingest_stage_probe"
    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"PROBE stage=$name sec=${(System.nanoTime() - t0) / 1e9}%.1f rows=$n")
    }

    // Build the three membership indexes once (not timed — write-time).
    val exactIdx = s"$fixRoot/exact"
    val nearIdx = s"$fixRoot/near"
    val semIdx = s"$fixRoot/sem"
    if (!new java.io.File(s"$exactIdx/_SUCCESS").exists())
      graft.llm.Dedup.writeExactDupIndex(docs, "doc_id", "text", 64, exactIdx)
    if (!new java.io.File(s"$nearIdx/_SUCCESS").exists())
      graft.llm.Dedup.writeSimhashWideIndex(docs, "doc_id", "text", 7, 64, nearIdx)
    if (!new java.io.File(s"$semIdx/_SUCCESS").exists())
      graft.llm.Similarity.writeLshIndex(emb, "vec_id", "embedding",
        numPlanes = 4, numTables = 4, path = semIdx)

    timed("exact_probe") {
      graft.streaming.Streams.dedupGateBatch(spark, exactIdx, arriving,
        "doc_id", "text", 64).count()
    }
    timed("near_probe") {
      graft.streaming.Streams.nearDupGateBatch(spark, nearIdx, arriving,
        "doc_id", "text", 7, 64).count()
    }
    timed("near_intra") {
      graft.llm.Dedup.simhashWidePairs(arriving, "doc_id", "text", 7).count()
    }
    timed("sem_probe_p4") {
      graft.streaming.Streams.semanticGateBatch(spark, semIdx, arriving,
        "doc_id", "embedding", 0.95, 4, 4).count()
    }
    val semAutoIdx = s"$fixRoot/semauto"
    if (!new java.io.File(s"$semAutoIdx/_SUCCESS").exists())
      graft.llm.Similarity.writeLshIndexAuto(emb, "vec_id", "embedding",
        numTables = 4, path = semAutoIdx)
    val planes = graft.llm.Similarity.lshIndexPlanes(spark, semAutoIdx)
    timed(s"sem_probe_auto_p$planes") {
      graft.streaming.Streams.semanticGateBatch(spark, semAutoIdx, arriving,
        "doc_id", "embedding", 0.95, planes, 4).count()
    }
    spark.stop()
  }
}
