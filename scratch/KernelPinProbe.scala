package scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 attribution probe for the post-kernel pin in the
  * static-prune probe builders: under `staticPrune` the banded probe
  * evaluates its query frame twice (key collect + join), and column
  * pruning cannot prune the per-row KERNEL the band key derives from
  * (simhash token pass / md5 normalize / LSH projection). Times the
  * three text/semantic membership gates in the STREAMING-SINK shape
  * (pinned batch, staticPrune = true) at two batch sizes:
  *   - batch-shaped: 10% of the corpus (the production micro-batch)
  *   - corpus-shaped: the full arriving set (the e2e fixture shape)
  * Run BEFORE the pinIf change (git stash) and AFTER on the same
  * window; the delta is the kernel's second run. Also times the bare
  * kernels once each so the expected saving is known independently.
  */
object KernelPinProbe {
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

    val fixRoot = "/tmp/kernel_pin_probe"
    val exactIdx = s"$fixRoot/exact"
    val nearIdx = s"$fixRoot/near"
    val semIdx = s"$fixRoot/sem"
    if (!new java.io.File(s"$exactIdx/_SUCCESS").exists())
      graft.llm.Dedup.writeExactDupIndex(docs, "doc_id", "text", 64, exactIdx)
    if (!new java.io.File(s"$nearIdx/_SUCCESS").exists())
      graft.llm.Dedup.writeSimhashWideIndexAuto(docs, "doc_id", "text", 7,
        nearIdx)
    if (!new java.io.File(s"$semIdx/_SUCCESS").exists())
      graft.llm.Similarity.writeLshIndexAuto(emb, "vec_id", "embedding",
        path = semIdx, numTables = graft.llm.Similarity.MultiProbeTables)
    val nearBuckets = graft.llm.Dedup.simhashWideIndexBuckets(spark, nearIdx)
    val semPlanes = graft.llm.Similarity.lshIndexPlanes(spark, semIdx)
    val semTables = graft.llm.Similarity.lshIndexTables(spark, semIdx)

    def timed(name: String, reps: Int = 2)(body: => Long): Unit = {
      var best = Double.MaxValue; var n = 0L
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        n = body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PROBE stage=$name sec=$best%.1f rows=$n")
    }

    for ((label, frac) <- Seq("batch10pct" -> 0.1, "corpus" -> 1.0)) {
      val arr0 = docs.join(emb, col("doc_id") === col("vec_id"))
        .select((col("doc_id") + 9000000L).as("doc_id"), col("text"),
          col("embedding"))
      val arriving = graft.ops.Materialize.pin(
        if (frac >= 1.0) arr0 else arr0.sample(seed = 7, fraction = frac))
      println(s"=== $label rows=${arriving.count()}")

      timed(s"${label}_kernel_simhash_once", reps = 2) {
        graft.llm.Dedup.simhashWideFrame(arriving, "doc_id", "text").count()
      }
      timed(s"${label}_exact_static") {
        graft.llm.Dedup.probeExactDupIndex(spark, exactIdx, arriving,
          "doc_id", "text", 64, staticPrune = true).count()
      }
      timed(s"${label}_near_static") {
        graft.llm.Dedup.probeSimhashWideIndex(spark, nearIdx, arriving,
          "doc_id", "text", 7, nearBuckets, staticPrune = true).count()
      }
      timed(s"${label}_sem_static_mp") {
        graft.llm.Similarity.probeLshThresholdMultiProbe(spark, semIdx,
          arriving, "doc_id", "embedding", threshold = 0.95,
          numPlanes = semPlanes, numTables = semTables,
          probeTables = math.min(semTables,
            graft.llm.Similarity.MultiProbeTables),
          staticPrune = true).count()
      }
      arriving.unpersist()
    }
    println("KERNELPINPROBE done")
    spark.stop()
  }
}
