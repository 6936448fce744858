package graft.queries
// scratch probe — lives in graft.queries for ensureClfModel access

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{Similarity, TextOps}
import graft.model.Tables

/** Round-18 A/B: the llm_stream_ingest_e2e dataflow at sf10 under the
  * r17 posture (compensated t(p)-table layout, exact-bucket semantic
  * stage) vs the round-18 multi-probe posture (4-table layout,
  * Hamming-1 expansion) — the driver-shape attribution for the
  * 77 s → 1006 s reading. Same arriving construction as the registered
  * query (LlmQueries.ingestE2eArriving, replicated here because it is
  * private to the query registry).
  */
object E2ePostureProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark

    val docs = Tables.documents(s, sfDir).select(col("doc_id"), col("text"))
    val base = docs
      .join(Tables.embeddings(s, sfDir).select(col("vec_id"), col("embedding")),
        col("doc_id") === col("vec_id"))
      .select("doc_id", "text", "embedding")
    val neg = transform(col("embedding"), x => -x).as("embedding")
    def sfx(tag: String) = concat(col("text"), lit(" " + tag),
      col("doc_id").cast("string"))
    def cls(r: Int) = base.filter(col("doc_id") % 11 === r)
    def half(t: org.apache.spark.sql.Column) =
      concat_ws(" ", slice(TextOps.tokens(t), lit(1),
        greatest(floor(size(TextOps.tokens(t)) / 2).cast("int"), lit(1))))
    val r5b = cls(5).join(
      docs.select((col("doc_id") - 1).as("doc_id"),
        col("text").as("next_text")), Seq("doc_id"))
    val arriving = cls(0).select((col("doc_id") + 2000000L).as("doc_id"),
        upper(concat(lit(" "), regexp_replace(col("text"), " ", "   "),
          lit("  "))).as("text"), neg)
      .unionByName(cls(1).select((col("doc_id") + 2110000L).as("doc_id"),
        sfx("zq").as("text"), neg))
      .unionByName(cls(1).select((col("doc_id") + 2160000L).as("doc_id"),
        sfx("zq").as("text"), neg))
      .unionByName(cls(2).select((col("doc_id") + 2200000L).as("doc_id"),
        concat_ws(" ", reverse(split(col("text"), " "))).as("text"), neg))
      .unionByName(cls(3).select((col("doc_id") + 2310000L).as("doc_id"),
        sfx("zr").as("text"), neg))
      .unionByName(cls(3).select((col("doc_id") + 2360000L).as("doc_id"),
        concat_ws(" ", reverse(split(sfx("zr"), " "))).as("text"), neg))
      .unionByName(cls(4).select((col("doc_id") + 2400000L).as("doc_id"),
        sfx("zs").as("text"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
      .unionByName(cls(5).select((col("doc_id") + 2510000L).as("doc_id"),
        sfx("zt").as("text"), neg))
      .unionByName(r5b.select((col("doc_id") + 2560000L).as("doc_id"),
        concat(col("next_text"), lit(" zu"),
          col("doc_id").cast("string")).as("text"), neg))
      .unionByName(cls(6).select((col("doc_id") + 2600000L).as("doc_id"),
        half(col("text")).as("text"), neg))
      .unionByName(cls(7).select((col("doc_id") + 2700000L).as("doc_id"),
        concat(half(col("text")), lit(" contact u"),
          col("doc_id").cast("string"), lit("@example.com")).as("text"), neg))

    def cfgFor(semFix: String, spt: Int) =
      graft.streaming.Streams.IngestPipelineConfig(
        exactIndexPath = LlmQueries.ensureExactDupIndex(s, sfDir),
        nearDupIndexPath = LlmQueries.ensureSimhashWideIndex(s, sfDir),
        semIndexPath = semFix,
        lmPath = LlmQueries.ensureKnLm(s, sfDir),
        clfModelPath = CurationQueries.ensureClfModel(s, sfDir),
        driftRefPath = LlmQueries.ensureDriftRef(s, sfDir),
        nBucketsExact = 64, maxHamming = 7, semThreshold = 0.95,
        numPlanes = Similarity.lshIndexPlanes(s, semFix),
        numTables = Similarity.lshIndexTables(s, semFix),
        semProbeTables = spt)

    def timed(name: String, cfg: graft.streaming.Streams.IngestPipelineConfig): Unit =
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val n = graft.streaming.Streams.ingestPipelineTrace(s, cfg,
          arriving, "doc_id", "text", "embedding").count()
        println(f"PROBE e2e=$name rep=$rep sec=${(System.nanoTime() - t0) / 1e9}%.1f rows=$n")
      }

    timed("r17_exact",
      cfgFor(LlmQueries.ensureLshIndexAuto(s, sfDir), 0))
    timed("r18_multiprobe",
      cfgFor(LlmQueries.ensureLshIndexMp(s, sfDir), 4))
    spark.stop()
  }
}
