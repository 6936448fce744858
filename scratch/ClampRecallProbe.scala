package scratch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Round-18 CLAMP-REGIME recall probe (r17 verdict #6): measure the
  * recall contract at the p=16 plane clamp, where
  * [[Similarity.lshPlanesAuto]] stops growing planes and
  * [[Similarity.lshTablesAuto]] pays its maximum table count (15) —
  * the regime the three recorded decades (sf0.1/1/10 stop at p=10)
  * never reached, and where the fixed-4-table counterfactual decays to
  * its analytic floor (~0.55 at cos 0.95).
  *
  * Corpus: 10M deterministic hash-uniform 64-dim vectors (lshPlanesAuto
  * clamps at n ≥ 256·2^15+1 ≈ 8.39M). Queries: the contract's
  * acos(0.96)-rotated planted pairs over every 3rd id < 9000 (3,000
  * queries — the rotation is the same (7,24,25)/25 isometry the
  * llm_lsh_recall_auto row uses, so every planted pair's cosine is
  * exactly 0.96, inside the [0.95, 1) gate band where recall genuinely
  * depends on bucket collisions). Ground truth: the full brute cosine
  * scan at 0.9 (Similarity.rangeSearch).
  *
  * The three postures' hits are computed INLINE (bucket-assignment
  * join + exact cosine) rather than through a materialized index: the
  * compensated 15-table layout carries a full vector copy per table
  * row — ~70 GB at 10M vectors, beyond this node's free disk — and an
  * index probe's hit set is BY CONSTRUCTION identical to the inline
  * bucket join (same deterministic hyperplanes, same cosine verify;
  * the per-decade recall rows measure the real index path). What the
  * clamp changes is the MATH (p, t, expansion), which is exactly what
  * this probe exercises:
  *   - compensated: exact buckets over t(16) = 15 tables
  *   - multiprobe:  exact + Hamming-1 buckets over the first 4 tables
  *   - fixed4:      exact buckets over the first 4 tables (the r16
  *                  counterfactual posture)
  *
  * Usage:
  *   sbt 'set Compile/unmanagedSourceDirectories += file("scratch"); \
  *        runMain scratch.ClampRecallProbe'   (SPARK_GRAFT_CLAMP_N to override n)
  */
object ClampRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "48g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = sys.env.getOrElse("SPARK_GRAFT_CLAMP_N", "10000000").toLong
    val planes = Similarity.lshPlanesAuto(n)
    val tables = Similarity.lshTablesAuto(planes)
    println(s"PROBE clamp n=$n planes=$planes tables=$tables")

    // Deterministic hash-uniform corpus: component i of vector v is
    // murmur3(vec_id, i) scaled to [-1, 1] — float-cast like the real
    // embeddings column so downstream arithmetic matches the contract.
    // MATERIALIZED to parquet before any bucket math (round-19 fix —
    // the reason the r18 run never finished): left lazy, Catalyst's
    // projection collapse inlines the 64-hash vector GENERATOR into
    // every one of the 15 × 16 plane projections (~100k expression
    // nodes per row), whole-stage codegen bails at that size, and the
    // bucket stage drops to INTERPRETED eval — a single task was
    // measured at ~15 min of CPU with the stage effectively unbounded.
    // A parquet round-trip makes the embedding a plain column, exactly
    // like the real embeddings table the contract rows read.
    def vecExpr = transform(sequence(lit(0), lit(63)),
      i => (pmod(hash(col("vec_id"), i), lit(2001)) - lit(1000))
        .cast("double") / lit(1000.0))
    val corpusPath = s"/tmp/clamp_corpus_$n"
    if (!new java.io.File(s"$corpusPath/_SUCCESS").exists()) {
      val t0 = System.nanoTime()
      spark.range(n).select(col("id").as("vec_id"))
        .withColumn("embedding", vecExpr)
        .write.mode("overwrite").parquet(corpusPath)
      println(f"PROBE corpus_materialize_sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    val corpus = spark.read.parquet(corpusPath)

    // The contract rotation: (0.96, 0.28) pairwise-plane isometry.
    val rc = lit(0.96); val rs = lit(0.28)
    val arriving = corpus
      .filter(col("vec_id") % 3 === 1 && col("vec_id") < 9000L)
      .select((col("vec_id") + 50000000L).as("vec_id"),
        col("embedding").as("vd"))
      .withColumn("embedding", transform(col("vd"), (x, i) =>
        when(i % 2 === 0,
          x * rc - element_at(col("vd"), i + lit(2)) * rs)
        .otherwise(element_at(col("vd"), i) * rs + x * rc)))
      .select("vec_id", "embedding")
      .transform(graft.ops.Materialize.pin)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val (truth, tTruth) = timed(graft.ops.Materialize.pin(
      Similarity.rangeSearch(corpus, arriving, "vec_id", "embedding",
        minCos = 0.9)))
    println(f"PROBE truth rows=${truth.count()} sec=$tTruth%.1f")

    import graft.functions.VectorFunctions.dot
    def buckets(df: DataFrame, nt: Int): DataFrame = df
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .select(col("vec_id"),
        posexplode(array((0 until nt).map(t =>
          Similarity.hyperplaneBucket(col("v"), planes, t)): _*))
          .as(Seq("tbl", "bucket")))

    val vecs = (side: String, df: DataFrame) => df.select(
      col("vec_id").as(s"${side}_id"),
      transform(col("embedding"), x => x.cast("double")).as(s"${side}v"))

    def recall(tag: String, ab: DataFrame, nt: Int): Unit = {
      val cb = buckets(corpus, nt)
      val (r, sec) = timed {
        val cand = cb.join(broadcast(ab), Seq("tbl", "bucket"))
          .select(col("query_id"), col("vec_id").as("cand_id")).distinct()
        val scored = cand
          .join(broadcast(vecs("q", arriving)),
            col("query_id") === col("q_id"))
          .join(vecs("c", corpus), col("cand_id") === col("c_id"))
          .withColumn("cos", dot(col("qv"), col("cv")) /
            (sqrt(dot(col("qv"), col("qv"))) * sqrt(dot(col("cv"), col("cv")))))
          .filter(col("cos") >= 0.9)
          .select(col("query_id"), col("cand_id"), lit(1).as("hit"))
        truth.join(scored, Seq("query_id", "cand_id"), "left")
          .agg(
            count(lit(1)).as("n_truth"),
            sum(when(col("cos") >= 0.95, 1).otherwise(0)).as("n_truth_gate"),
            sum(when(col("cos") >= 0.95, coalesce(col("hit"), lit(0)))
              .otherwise(0)).as("n_hit_gate"))
          .withColumn("recall_gate", col("n_hit_gate").cast("double") /
            col("n_truth_gate").cast("double"))
          .collect()(0)
      }
      println(f"PROBE $tag n_truth=${r.getLong(0)} " +
        s"n_truth_gate=${r.getLong(1)} n_hit_gate=${r.getLong(2)} " +
        f"recall_gate=${r.getDouble(3)}%.4f sec=$sec%.1f")
    }

    val abExact = (nt: Int) => buckets(arriving, nt)
      .select(col("vec_id").as("query_id"), col("tbl"), col("bucket"))
    // Hamming-1 expansion over the 4-table prefix — the
    // probeLshThresholdMultiProbe probe set.
    val abMp = abExact(Similarity.MultiProbeTables)
      .select(col("query_id"), col("tbl"),
        explode(array(Seq(col("bucket")) ++ (0 until planes).map(j =>
          col("bucket").bitwiseXOR(lit(1L << j))): _*)).as("bucket"))

    recall(s"compensated p=$planes t=$tables", abExact(tables), tables)
    recall(s"multiprobe p=$planes probeTables=4", abMp,
      Similarity.MultiProbeTables)
    recall(s"fixed4 p=$planes t=4", abExact(4), 4)

    spark.stop()
  }
}
