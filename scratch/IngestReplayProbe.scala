package graft.queries
// scratch probe — lives in graft.queries for ensure* fixture access

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Similarity
import graft.model.Tables

/** Round-19 sf100 BATCH-PARTITIONED ingest-e2e replay (r18 verdict #1):
  * the third-decade measurement of the composed ingest pipeline taken
  * the way production runs it — the arriving set driven through
  * [[graft.streaming.Streams.startIngestPipelineSink]] in micro-batches
  * (file source, one file per trigger), NOT as one corpus-sized trace.
  * The r18 attempts died feeding the whole ~2M-row fixture as a single
  * batch: the membership probes' broadcast side is batch-sized by
  * design, and a corpus-sized "batch" inflated the multi-probe band
  * frame to ~88M broadcast rows (driver GC death). Round-19 adds the
  * broadcast guard (BandedIndex cap-and-drop) so even that shape
  * degrades instead of dying; THIS probe records the contract shape:
  * per-batch wall + spill + per-stage rows/wall across the replay, so
  * super-linearity (a later batch slower than an earlier one at equal
  * size, beyond index growth) is attributable from the artifacts.
  *
  * The three membership indexes are COPIED into the probe's temp root
  * first — the sink appends accepted rows per batch (that growth is the
  * point), and the shared fixture cache must stay pristine for other
  * queries.
  *
  * Usage (sf100 preconditions: >= 60 GB free on the local dir):
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 SPARK_DRIVER_MEM=64g
  *   SPARK_GRAFT_LOCAL_DIR=/tmp/spark-local
  *   [SPARK_GRAFT_REPLAY_BATCHES=8]
  *   sbt 'set Compile/unmanagedSourceDirectories += file("scratch"); \
  *        runMain graft.queries.IngestReplayProbe'
  */
object IngestReplayProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf100")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_REPLAY_BATCHES", "8").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark

    @volatile var memSpill = 0L
    @volatile var diskSpill = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit = {
        memSpill += st.stageInfo.taskMetrics.memoryBytesSpilled
        diskSpill += st.stageInfo.taskMetrics.diskBytesSpilled
      }
    })

    // ---- arriving set: the registered e2e query's construction
    // (LlmQueries.ingestE2eArriving is private; replicated as in
    // E2ePostureProbe) ----
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
      concat_ws(" ", slice(graft.llm.TextOps.tokens(t), lit(1),
        greatest(floor(size(graft.llm.TextOps.tokens(t)) / 2).cast("int"),
          lit(1))))
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
      // Round-20 GROWTH mode (r19 verdict item 2): the fixture
      // embeddings carry ~2,000 distinct directions, so the semantic
      // INTRA-batch check collapses every batch and accepted stays 0 —
      // the r19 replay measured flat per-batch cost against STATIC
      // corpus-sized indexes, never a growing one. With
      // SPARK_GRAFT_REPLAY_RICH=1 the arriving embeddings are replaced
      // by a deterministic per-doc hash direction (every doc its own
      // direction, no rand() — replay-stable), so rows survive both
      // semantic checks, the sink APPENDS them, and the per-batch wall
      // measures probes against indexes that GROW across the replay.
      .transform { arr =>
        if (!sys.env.get("SPARK_GRAFT_REPLAY_RICH").contains("1")) arr
        else arr.withColumn("embedding",
          transform(sequence(lit(0), lit(63)), j =>
            ((pmod(xxhash64(col("doc_id"), j), lit(2000003L)).cast("double")
              / 1000001.0) - 1.0).cast("float")))
      }

    val root = java.nio.file.Files.createTempDirectory("ingestreplay").toString
    println(s"PROBE root=$root batches=$nBatches sf=$sfDir " +
      s"rich=${sys.env.get("SPARK_GRAFT_REPLAY_RICH").contains("1")}")

    // ---- land the arriving set as nBatches files: the file source
    // with maxFilesPerTrigger=1 then replays it as nBatches
    // production-shaped micro-batches. Hash-repartition by id so every
    // batch is a uniform sample (equal size, same duplicate-class mix). ----
    val t0 = System.nanoTime()
    arriving.repartition(nBatches, col("doc_id"))
      .write.parquet(s"$root/arriving")
    val nArr = spark.read.parquet(s"$root/arriving").count()
    println(f"PROBE arriving rows=$nArr landed_sec=${(System.nanoTime() - t0) / 1e9}%.1f")

    // ---- copy the three membership indexes (the sink grows them).
    // Shell cp -r, not Hadoop FileUtil.copy: the banded layouts are
    // ~100k small files (bands x buckets directories), and the
    // per-file java copy measured ~500 MB / 10 min on them — probe
    // plumbing, local FS only, excluded from every measurement. ----
    def copyIndex(src: String, name: String): String = {
      val dst = s"$root/$name"
      val rc = new ProcessBuilder("cp", "-r", src, dst)
        .inheritIO().start().waitFor()
      require(rc == 0, s"cp -r $src $dst failed rc=$rc")
      dst
    }
    val tCopy = System.nanoTime()
    val exactIdx = copyIndex(LlmQueries.ensureExactDupIndex(s, sfDir), "exact")
    val nearIdx = copyIndex(LlmQueries.ensureSimhashWideIndex(s, sfDir), "near")
    val semIdx = copyIndex(LlmQueries.ensureLshIndexMp(s, sfDir), "sem")
    println(f"PROBE index_copies_sec=${(System.nanoTime() - tCopy) / 1e9}%.1f")

    val cfg = graft.streaming.Streams.IngestPipelineConfig(
      exactIndexPath = exactIdx,
      nearDupIndexPath = nearIdx,
      semIndexPath = semIdx,
      lmPath = LlmQueries.ensureKnLm(s, sfDir),
      clfModelPath = CurationQueries.ensureClfModel(s, sfDir),
      driftRefPath = LlmQueries.ensureDriftRef(s, sfDir),
      nBucketsExact = 64, maxHamming = 7, semThreshold = 0.95,
      numPlanes = Similarity.lshIndexPlanes(s, semIdx),
      numTables = Similarity.lshIndexTables(s, semIdx),
      semProbeTables = Similarity.MultiProbeTables)

    // Per-batch wall + spill from the progress stream (stage-level
    // rows/walls land in <monitor>_stages/batch_id=N, dumped below).
    var lastMem = 0L
    var lastDisk = 0L
    var lastT = System.nanoTime()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val now = System.nanoTime()
          if (e.progress.numInputRows > 0) {
            println(f"PROBE batch=${e.progress.batchId} " +
              f"rows=${e.progress.numInputRows} " +
              f"wall_sec=${(now - lastT) / 1e9}%.1f " +
              f"mem_spill_mb=${(memSpill - lastMem) / 1048576} " +
              f"disk_spill_mb=${(diskSpill - lastDisk) / 1048576}")
          }
          lastMem = memSpill; lastDisk = diskSpill; lastT = now
        }
      })

    val tRun = System.nanoTime()
    val q = graft.streaming.Streams.startIngestPipelineSink(
      spark.readStream
        .schema(spark.read.parquet(s"$root/arriving").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$root/arriving"),
      cfg, s"$root/out", s"$root/monitor", s"$root/ckpt",
      "doc_id", "text", "embedding")
    q.processAllAvailable()
    q.stop()
    val wall = (System.nanoTime() - tRun) / 1e9
    val nAccepted = spark.read.parquet(s"$root/out").count()
    println(f"PROBE replay_total_sec=$wall%.1f accepted=$nAccepted " +
      f"of=$nArr mem_spill_mb=${memSpill / 1048576} " +
      f"disk_spill_mb=${diskSpill / 1048576}")

    // Per-stage operational report across all batches — the sink's own
    // observability surface, printed for the BASELINE row.
    spark.read.parquet(s"$root/monitor_stages")
      .selectExpr("cast(batch_id as long) AS b", "stage",
        "cast(stage_idx as int) AS i", "rows_in", "rows_out", "wall_ms")
      .orderBy(col("b"), col("i"))
      .collect()
      .foreach(r => println(s"PROBE stage batch=${r.getLong(0)} " +
        s"${r.getString(1)} in=${r.getLong(3)} out=${r.getLong(4)} " +
        s"wall_ms=${r.getLong(5)}"))

    // Leave nothing behind: the copies + output are tens of GB at sf100.
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
