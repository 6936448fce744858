package scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Round-18 attribution probe: where did llm_stream_ingest_e2e's sf10
  * wall go when the semantic stage flipped to the multi-probe posture
  * (77 s → 1006 s)? Times the semantic CORPUS probe and the semantic
  * INTRA check separately, in both postures, on the e2e-shaped
  * corpus-sized arriving set — probe cost is linear in batch ×
  * expansion, intra is quadratic-in-batch within buckets, so the two
  * react very differently to the ×(p+1) bucket expansion.
  */
object MpStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val arriving = emb
      .select((col("vec_id") + 9000000L).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
      .transform(graft.ops.Materialize.pin)
    println(s"PROBE corpus=$n arriving=${arriving.count()}")

    val autoFix = graft.queries.LlmQueries.ensureLshIndexAuto(spark, sfDir)
    val mpFix = graft.queries.LlmQueries.ensureLshIndexMp(spark, sfDir)
    val p = Similarity.lshIndexPlanes(spark, autoFix)
    val tAuto = Similarity.lshIndexTables(spark, autoFix)
    println(s"PROBE layout planes=$p tablesCompensated=$tAuto")

    def timed(name: String)(body: => Long): Unit =
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val c = body
        println(f"PROBE stage=$name rep=$rep sec=${(System.nanoTime() - t0) / 1e9}%.1f rows=$c")
      }

    timed(s"corpus_exact_t$tAuto") {
      Similarity.probeLshThreshold(spark, autoFix, arriving, "vec_id",
        "embedding", 0.95, p, tAuto, staticPrune = true).count()
    }
    timed("corpus_multiprobe_t4") {
      Similarity.probeLshThresholdMultiProbe(spark, mpFix, arriving,
        "vec_id", "embedding", 0.95, p, 4, probeTables = 4,
        staticPrune = true).count()
    }
    timed("intra_exact_t4") {
      graft.streaming.Streams.semanticIntraBatchDups(arriving, "vec_id",
        "embedding", 0.95, p, 4).count()
    }
    timed("intra_multiprobe_t4") {
      graft.streaming.Streams.semanticIntraBatchDups(arriving, "vec_id",
        "embedding", 0.95, p, 4, probeTables = 4).count()
    }
    spark.stop()
  }
}
