package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 attribution probe for the r19 verdict's item 1: the
  * "index-side verify mass" that dominates the sf100 composed-ingest
  * batches (~320-407 s/batch near-dup + ~139-152 s semantic of every
  * ~600 s batch). Decomposes the two probes into stages at sf10, each
  * noop-timed (min-of-2) in the streaming-sink posture (pinned batch,
  * staticPrune) so the deltas attribute the wall:
  *
  *   near: scan_full (bare index read) | kernel_pin | key_collect |
  *         join_raw (pruned join BEFORE the hamming verify, full
  *         width) | full probe | candidate mass (rows into the verify)
  *   sem:  scan_full | join_raw (multi-probe band join before
  *         re-attach) | reattach_raw (re-attach join, before cosine) |
  *         full probe | candidate mass
  *
  * Lives in package graft.llm so it can drive BandedIndex directly;
  * the band-slice replication uses the same private[graft]
  * wideBandLayout the library consumes, so the replicated qb is
  * construction-identical.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 sbt -batch
  *   'set Compile/unmanagedSourceDirectories += file("scratch");
  *    runMain graft.llm.VerifyMassProbe'
  */
object VerifyMassProbe {
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

    val fixRoot = "/tmp/kernel_pin_probe" // share r19's fixture cache
    val nearIdx = s"$fixRoot/near"
    val semIdx = s"$fixRoot/sem"
    if (!new java.io.File(s"$nearIdx/_SUCCESS").exists())
      Dedup.writeSimhashWideIndexAuto(docs, "doc_id", "text", 7, nearIdx)
    if (!new java.io.File(s"$semIdx/_SUCCESS").exists())
      Similarity.writeLshIndexAuto(emb, "vec_id", "embedding",
        path = semIdx, numTables = Similarity.MultiProbeTables)
    val nearBuckets = Dedup.simhashWideIndexBuckets(spark, nearIdx)
    val semPlanes = Similarity.lshIndexPlanes(spark, semIdx)
    val semTables = Similarity.lshIndexTables(spark, semIdx)
    def dirStats(path: String): (Long, Long) = {
      val (fs, dir) = BandedIndex.hadoopFs(spark, path)
      val it = fs.listFiles(dir, true)
      var files = 0L; var bytes = 0L
      while (it.hasNext) {
        val f = it.next()
        if (!f.getPath.getName.startsWith("_")) { files += 1; bytes += f.getLen }
      }
      (files, bytes)
    }
    val (nf, nb) = dirStats(nearIdx)
    val (sf, sb) = dirStats(semIdx)
    println(s"PROBE near_index files=$nf bytes=$nb buckets=$nearBuckets")
    println(s"PROBE sem_index files=$sf bytes=$sb planes=$semPlanes tables=$semTables")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String, reps: Int = 2)(body: => Unit): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PROBE stage=$name sec=$best%.2f")
    }

    val maxHamming = 7
    val nearParams = Map("family" -> "simhash-wide",
      "maxHamming" -> maxHamming.toString, "nBuckets" -> nearBuckets.toString)

    for ((label, frac) <- Seq("batch10pct" -> 0.1, "corpus" -> 1.0)) {
      val arr0 = docs.join(emb, col("doc_id") === col("vec_id"))
        .select((col("doc_id") + 9000000L).as("doc_id"), col("text"),
          col("embedding"))
      val arriving = graft.ops.Materialize.pin(
        if (frac >= 1.0) arr0 else arr0.sample(seed = 7, fraction = frac))
      println(s"=== $label rows=${arriving.count()}")

      // ---- NEAR (wide simhash) ----
      timed(s"${label}_near_scan_full") { noop(spark.read.parquet(nearIdx)) }
      var sigs: org.apache.spark.sql.DataFrame = null
      timed(s"${label}_near_kernel_pin", reps = 1) {
        sigs = graft.ops.Materialize.pin(
          Dedup.simhashWideFrame(arriving, "doc_id", "text")
            .select(col("doc_id").as("id"), col("simhash_lo").as("sh_lo"),
              col("simhash_hi").as("sh_hi")))
      }
      // Replicated band explode (wideBandLayout is THE shared slice
      // definition, so this qb is construction-identical to the
      // library's).
      val all = Dedup.wideBandLayout(60, 60, maxHamming).map { s =>
        val word = if (s.word == 0) col("sh_lo") else col("sh_hi")
        (s.band, shiftright(word, s.start).bitwiseAND((1L << s.width) - 1))
      }
      val qb = sigs.select(col("id"), col("sh_lo"), col("sh_hi"),
        explode(array(all.map { case (b, k) =>
          struct(lit(b).as("band"), k.as("key")) }: _*)).as("bk"))
        .select(col("id").as("query_id"), col("sh_lo").as("q_lo"),
          col("sh_hi").as("q_hi"), col("bk.band").as("band"),
          col("bk.key").as("key"),
          pmod(col("bk.key"), lit(nearBuckets.toLong)).cast("int").as("bkt"))
      timed(s"${label}_near_key_collect") {
        qb.groupBy(col("band"), col("bkt")).agg(count(lit(1))).collect()
      }
      val joinedRaw = BandedIndex.probeJoinStatic(spark, nearIdx, qb,
        Seq("key"), nearParams)
      timed(s"${label}_near_join_raw") { noop(joinedRaw) }
      println(s"PROBE ${label}_near_candidate_mass rows=${joinedRaw.count()}")
      timed(s"${label}_near_full") {
        noop(Dedup.probeSimhashWideIndex(spark, nearIdx, arriving,
          "doc_id", "text", maxHamming, nearBuckets, staticPrune = true))
      }

      // ---- SEM (multi-probe LSH) ----
      timed(s"${label}_sem_scan_full") { noop(spark.read.parquet(semIdx)) }
      val probeTables = math.min(semTables, Similarity.MultiProbeTables)
      val q = graft.ops.Materialize.pin(
        arriving.select(col("doc_id").as("query_id"),
          transform(col("embedding"), x => x.cast("double")).as("qv"))
          .withColumn("qnorm",
            sqrt(graft.functions.VectorFunctions.dot(col("qv"), col("qv")))))
      val base = q.select(col("query_id"),
        posexplode(array((0 until probeTables).map(t =>
          Similarity.hyperplaneBucket(col("qv"), semPlanes, t)): _*))
          .as(Seq("band", "bkt0")))
      val sqb = base.select(col("query_id"), col("band"),
        explode(array(Seq(col("bkt0")) ++ (0 until semPlanes).map(j =>
          col("bkt0").bitwiseXOR(lit(1L << j))): _*)).as("bkt"))
        .withColumn("bkt", col("bkt").cast("int"))
      val semParams = Map("family" -> "lsh-hyperplane",
        "numPlanes" -> semPlanes.toString, "numTables" -> semTables.toString)
      val semJoinedRaw = BandedIndex.probeJoinStatic(spark, semIdx, sqb,
        Nil, semParams,
        maxBroadcastRows = BandedIndex.MaxProbeBroadcastRowsNarrow)
      timed(s"${label}_sem_join_raw") { noop(semJoinedRaw) }
      println(s"PROBE ${label}_sem_candidate_mass rows=${semJoinedRaw.count()}")
      val reattached = semJoinedRaw.join(broadcast(q), Seq("query_id"))
      timed(s"${label}_sem_reattach_raw") { noop(reattached) }
      timed(s"${label}_sem_full") {
        noop(Similarity.probeLshThresholdMultiProbe(spark, semIdx, arriving,
          "doc_id", "embedding", threshold = 0.95, numPlanes = semPlanes,
          numTables = semTables, probeTables = probeTables,
          staticPrune = true))
      }
      q.unpersist()
      sigs.unpersist()
      arriving.unpersist()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    println("VERIFYMASSPROBE done")
    spark.stop()
  }
}
