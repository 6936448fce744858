package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 follow-up to VerifyMassProbe: attribute (a) WHERE the
  * banded-index scan cost lives — relation construction (driver-side
  * listing + schema inference), file listing, or the data read — per
  * rep (not min), against the same rows in coarser layouts; and (b)
  * the near-probe's verify tail — join vs +hamming vs +filter vs
  * +distinct, with survivor counts.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 sbt -batch
  *   'set Compile/unmanagedSourceDirectories += file("scratch");
  *    runMain graft.llm.ReadCostProbe'
  */
object ReadCostProbe {
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
    val nearIdx = s"$fixRoot/near"   // built by VerifyMassProbe (nb=1024)
    require(new java.io.File(s"$nearIdx/_SUCCESS").exists(),
      "run VerifyMassProbe first (builds the near index)")
    val nearBuckets = Dedup.simhashWideIndexBuckets(spark, nearIdx)

    // Coarser twins of the SAME rows: nb=64 (512 dirs) and nb=8
    // (64 dirs) — bkt = key mod nBuckets is pruning-only for the
    // hamming families, so probe results are identical by construction.
    def coarse(nb: Int): String = {
      val p = s"$fixRoot/near_nb$nb"
      if (!new java.io.File(s"$p/_SUCCESS").exists())
        Dedup.writeSimhashWideIndex(docs, "doc_id", "text", 7, nb, p)
      p
    }
    val near64 = coarse(64)
    val near8 = coarse(8)
    // And the same rows as ONE flat unpartitioned parquet dir.
    val flat = s"$fixRoot/near_flat"
    if (!new java.io.File(s"$flat/_SUCCESS").exists())
      spark.read.parquet(nearIdx).write.mode("overwrite").parquet(flat)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // (a) scan attribution, PER REP (rep1 vs rep2 shows listing-cache
    // behavior), phases split: construct (listing+schema), inputFiles,
    // full data read.
    for ((label, path) <- Seq(s"nb$nearBuckets" -> nearIdx, "nb64" -> near64,
        "nb8" -> near8, "flat" -> flat); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = spark.read.parquet(path)
      val t1 = System.nanoTime()
      val nf = df.inputFiles.length
      val t2 = System.nanoTime()
      noop(df)
      val t3 = System.nanoTime()
      println(f"PROBE scan layout=$label rep=$rep files=$nf " +
        f"construct_sec=${(t1 - t0) / 1e9}%.2f " +
        f"listfiles_sec=${(t2 - t1) / 1e9}%.2f " +
        f"read_sec=${(t3 - t2) / 1e9}%.2f")
    }

    // (b) near verify tail decomposition on the corpus-shaped batch.
    val arriving = graft.ops.Materialize.pin(
      docs.join(emb, col("doc_id") === col("vec_id"))
        .select((col("doc_id") + 9000000L).as("doc_id"), col("text")))
    println(s"=== arriving rows=${arriving.count()}")
    val sigs = graft.ops.Materialize.pin(
      Dedup.simhashWideFrame(arriving, "doc_id", "text")
        .select(col("doc_id").as("id"), col("simhash_lo").as("sh_lo"),
          col("simhash_hi").as("sh_hi")))
    val all = Dedup.wideBandLayout(60, 60, 7).map { s =>
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
    val nearParams = Map("family" -> "simhash-wide",
      "maxHamming" -> "7", "nBuckets" -> nearBuckets.toString)
    val joined = BandedIndex.probeJoinStatic(spark, nearIdx, qb,
      Seq("key"), nearParams)
    def timed(name: String)(body: => Unit): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PROBE stage=$name sec=$best%.2f")
    }
    val withH = joined.withColumn("hamming",
      bit_count(col("q_lo").bitwiseXOR(col("sh_lo"))) +
        bit_count(col("q_hi").bitwiseXOR(col("sh_hi"))))
    timed("near_join_plus_hamming") { noop(withH) }
    val filtered = withH.filter(col("hamming") <= 7)
      .select(col("query_id"), col("cand_id"), col("hamming"))
    timed("near_filtered_nodistinct") { noop(filtered) }
    println(s"PROBE near_survivor_rows=${filtered.count()}")
    timed("near_filtered_distinct") { noop(filtered.distinct()) }
    println(s"PROBE near_distinct_rows=${filtered.distinct().count()}")

    // And the full library probe against each coarser layout — same
    // results, different read granularity.
    for ((label, path, nb) <- Seq(
        (s"nb$nearBuckets", nearIdx, nearBuckets), ("nb64", near64, 64),
        ("nb8", near8, 8))) {
      timed(s"near_full_$label") {
        noop(Dedup.probeSimhashWideIndex(spark, path, arriving,
          "doc_id", "text", 7, nb, staticPrune = true))
      }
    }
    println("READCOSTPROBE done")
    spark.stop()
  }
}
