package scratch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Multimodal}

/** Round-17 before/after evidence for the AUDIO index auto-width (r16
  * verdict #5): build the wide audio-fingerprint index at the legacy
  * FIXED nBuckets=64 and at the corpus-derived auto width
  * ([[Dedup.writeHammingWideIndexAuto]]), probe each with the same
  * 50-clip delta, and record the pruned read's numFiles/numPartitions
  * scan metrics plus probe wall — the DPP-saturation measurement the
  * text family's round-12 sizing recorded, now for audio. AQE off so
  * the index FileSourceScanExec sits in executedPlan with readable
  * metrics.
  *
  * Usage:
  *   sbt 'set Compile/unmanagedSourceDirectories += file("scratch"); \
  *        runMain scratch.AudioIdxProbe /tmp/graft_sf10'
  */
object AudioIdxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sp: SparkSession = spark
    val sf = args.headOption.getOrElse("/tmp/graft_sf10")
    val out = "/tmp/graft_audioidx"
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    val nDocs = docs.count()

    def sigs(src: DataFrame): DataFrame =
      Multimodal.extractAudioHashesWide(
        Multimodal.syntheticAudioGroups(src, "doc_id")).toDF()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // Decode the corpus fingerprints ONCE; both builds reuse the pinned
    // frame so the before/after compares LAYOUTS, not codec runs. The
    // DELTA side is deliberately NOT pinned: a localCheckpointed frame
    // reports unknown (max) size stats, which fails DPP's
    // pruning-has-benefit heuristic — the registered probe queries
    // derive their delta straight from the parquet scan, so this probe
    // must too (measured here: the pinned variant read every file).
    val corpusSigs = graft.ops.Materialize.pin(sigs(docs))
    def delta: DataFrame = sigs(docs.filter(col("doc_id") < 50))

    def probe(tag: String, path: String, nBuckets: Int): Unit = {
      (1 to 3).foreach { rep =>
        val df = Dedup.probeHammingWideIndex(spark, path, delta,
          "media_id", "ehash", "rhash", nLoBits = 56, nHiBits = 54,
          maxHamming = 7, nBuckets = nBuckets)
        val (n, s) = timed(df.queryExecution.executedPlan.execute().count())
        val scans = df.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec if f.relation.location.rootPaths
            .exists(_.toString.contains("graft_audioidx")) => f
        }
        val files = scans.map(_.metrics.get("numFiles").map(_.value).getOrElse(-1L))
        val parts = scans.map(_.metrics.get("numPartitions").map(_.value).getOrElse(-1L))
        val dpp = scans.map(_.partitionFilters.mkString(",")
          .toLowerCase.contains("dynamicpruning"))
        println(f"PROBE $tag rep=$rep rows=$n wall=$s%.2f " +
          s"filesRead=${files.mkString("+")} partsRead=${parts.mkString("+")} " +
          s"dpp=${dpp.mkString("+")} " +
          s"totalFiles=${spark.read.parquet(path).inputFiles.length}")
      }
    }

    val (_, bFixed) = timed(Dedup.writeHammingWideIndex(corpusSigs,
      "media_id", "ehash", "rhash", nLoBits = 56, nHiBits = 54,
      maxHamming = 7, nBuckets = 64, path = s"$out/fixed64"))
    println(f"PROBE build fixed64 docs=$nDocs sec=$bFixed%.1f")
    probe("fixed64 nb=64", s"$out/fixed64", 64)

    val (nbAuto, bAuto) = timed(Dedup.writeHammingWideIndexAuto(corpusSigs,
      "media_id", "ehash", "rhash", nLoBits = 56, nHiBits = 54,
      maxHamming = 7, path = s"$out/auto", rowsHint = nDocs))
    println(f"PROBE build auto nb=$nbAuto docs=$nDocs sec=$bAuto%.1f")
    probe(s"auto nb=$nbAuto", s"$out/auto", nbAuto)

    spark.stop()
  }
}
