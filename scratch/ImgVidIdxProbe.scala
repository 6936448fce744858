package scratch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Multimodal}

/** Round-18 before/after evidence for the IMAGE and STRIDED-VIDEO index
  * auto-width (r17 verdict #1 — the audio family's measured fix
  * extended to the remaining perceptual families): build each wide
  * index at the legacy FIXED nBuckets=64 and at the corpus-derived
  * auto width, probe each with the same 50-item delta, and record the
  * pruned read's numFiles/numPartitions scan metrics plus probe wall.
  * AQE off so the index FileSourceScanExec sits in executedPlan with
  * readable metrics. Same methodology as scratch/AudioIdxProbe
  * (BASELINE.md round-17 row).
  *
  * Usage:
  *   sbt 'set Compile/unmanagedSourceDirectories += file("scratch"); \
  *        runMain scratch.ImgVidIdxProbe /tmp/graft_sf10'
  */
object ImgVidIdxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sp: SparkSession = spark
    val sf = args.headOption.getOrElse("/tmp/graft_sf10")
    val out = "/tmp/graft_imgvididx"
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    val nDocs = docs.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def family(tag: String, sigsOf: DataFrame => DataFrame,
               loCol: String, hiCol: String, rowsHint: Long): Unit = {
      // Decode the corpus ONCE; both builds reuse the pinned frame so
      // the before/after compares LAYOUTS, not codec runs. The delta
      // is NOT pinned (DPP must get real stats — the registered probe
      // queries derive theirs from the parquet scan too).
      val corpusSigs = graft.ops.Materialize.pin(sigsOf(docs))
      def delta: DataFrame = sigsOf(docs.filter(col("doc_id") < 50))

      def probe(sub: String, path: String, nBuckets: Int): Unit =
        (1 to 3).foreach { rep =>
          val df = Dedup.probeHammingWideIndex(spark, path, delta,
            "media_id", loCol, hiCol, nLoBits = 56, nHiBits = 54,
            maxHamming = 7, nBuckets = nBuckets)
          val (n, s) = timed(df.queryExecution.executedPlan.execute().count())
          val scans = df.queryExecution.executedPlan.collect {
            case f: FileSourceScanExec if f.relation.location.rootPaths
              .exists(_.toString.contains("graft_imgvididx")) => f
          }
          val files = scans.map(_.metrics.get("numFiles").map(_.value).getOrElse(-1L))
          val parts = scans.map(_.metrics.get("numPartitions").map(_.value).getOrElse(-1L))
          println(f"PROBE $tag $sub rep=$rep rows=$n wall=$s%.2f " +
            s"filesRead=${files.mkString("+")} partsRead=${parts.mkString("+")} " +
            s"totalFiles=${spark.read.parquet(path).inputFiles.length}")
        }

      val (_, bFixed) = timed(Dedup.writeHammingWideIndex(corpusSigs,
        "media_id", loCol, hiCol, nLoBits = 56, nHiBits = 54,
        maxHamming = 7, nBuckets = 64, path = s"$out/${tag}_fixed64"))
      println(f"PROBE $tag build fixed64 docs=$nDocs sec=$bFixed%.1f")
      probe("fixed nb=64", s"$out/${tag}_fixed64", 64)

      val (nbAuto, bAuto) = timed(Dedup.writeHammingWideIndexAuto(corpusSigs,
        "media_id", loCol, hiCol, nLoBits = 56, nHiBits = 54,
        maxHamming = 7, path = s"$out/${tag}_auto", rowsHint = rowsHint))
      println(f"PROBE $tag build auto nb=$nbAuto sec=$bAuto%.1f")
      probe(s"auto nb=$nbAuto", s"$out/${tag}_auto", nbAuto)
    }

    family("image", src => Multimodal.extractImageHashesWide(
        Multimodal.syntheticImageGroups(src, "doc_id")).toDF(),
      "dhash", "vhash", rowsHint = nDocs)
    family("vstrided", src => Multimodal.extractVideoFrameHashesStridedWide(
        Multimodal.syntheticVideoGroupsStrided(src, "doc_id"), k = 3).toDF(),
      "dhash", "vhash", rowsHint = 3L * nDocs)

    spark.stop()
  }
}
