package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, TextOps}
import graft.ops.Reshape

/** Property-based invariants (SURVEY §5): structural laws that must hold
  * for ANY input, not just the fixtures.
  */
class PropertySpec extends SparkSpec {

  /** Seeded ScalaCheck sampling (the scalatest bridge isn't on the
    * offline classpath; plain Gen + fixed seeds keeps runs deterministic).
    */
  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  import spark.implicits._

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")
  private val doc = Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))

  test("pivot . unpivot is the identity on unique keys (random frames)") {
    for (seed <- 1 to 5) {
      val n = sample(Gen.chooseNum(1, 20), seed)
      val base = (1 to n).map(i => (i.toLong, i * 1.5, i * -0.5))
        .toDF("id", "m_a", "m_b")
      val long = Reshape.unpivot(base, Seq("id"), Seq("m_a", "m_b"), "k", "v")
      val wide = Reshape.pivot(long, Seq("id"), "k", "v", Seq("m_a", "m_b"))
      assert(wide.orderBy("id").collect().toSeq ===
        base.orderBy("id").collect().toSeq)
    }
  }

  test("surrogateKey is dense 1..n in key order, invariant to input partitioning") {
    for (seed <- 1 to 3) {
      val n = sample(Gen.chooseNum(5, 400), seed)
      // Shuffled unique keys with gaps: id must follow key order, not
      // insertion or partition order.
      val keys = new scala.util.Random(seed).shuffle((1 to n).map(_ * 7L).toList)
      val expected = (1 to n).map(i => (i * 7L, i.toLong))
      for (parts <- Seq(1, 3, 8)) {
        val df = keys.toDF("k").repartition(parts)
        val out = ops.Windows.surrogateKey(df, "id", col("k"))
          .select("k", "id").as[(Long, Long)].collect().sortBy(_._1).toSeq
        assert(out === expected, s"n=$n parts=$parts")
      }
    }
  }

  test("keyed transpose equals the union of per-key transposes (random matrices)") {
    for (seed <- 1 to 3) {
      val nMetrics = sample(Gen.chooseNum(2, 6), seed)
      val nPeriods = sample(Gen.chooseNum(1, 4), seed + 100)
      val metrics = (1 to nMetrics).map(i => s"Metric $i")
      val periods = (1 to nPeriods).map(i => s"202$i-12-31")
      val tickers = Seq("AAA", "BBB", "CCC")
      def cell(t: String, m: Int, p: Int) =
        (tickers.indexOf(t) * 1000 + m * 10 + p).toDouble + 0.5
      // One stacked frame, as globWithKey would produce it.
      val rows = for (t <- tickers; (m, mi) <- metrics.zipWithIndex)
        yield (t +: m +: periods.indices.map(pi => cell(t, mi, pi).toString))
      val stacked = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(org.apache.spark.sql.Row(_: _*))),
        org.apache.spark.sql.types.StructType(
          ("Ticker" +: "name" +: periods).map(c =>
            org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType))))
      val keyed = Reshape.transposeStatementKeyed(stacked, "name", metrics, "Ticker")
        .collect().map(_.toString).sorted
      val perKey = tickers.flatMap { t =>
        Reshape.transposeStatement(
            stacked.filter(col("Ticker") === t).drop("Ticker"), "name", metrics, t)
          .select(("Ticker" +: "Date" +: metrics).map(col): _*)
          .collect().map(_.toString)
      }.sorted
      assert(keyed.toSeq === perKey.toSeq, s"seed=$seed")
    }
  }

  test("exactDedup output ids are a subset of input ids and cover all texts") {
    for (seed <- 1 to 3) {
      val docs = sample(Gen.listOfN(30, doc), seed)
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
        .toDF("doc_id", "text")
      val out = Dedup.exactDedup(df, "doc_id", "text")
      val distinctTexts = docs.map(d =>
        d.toLowerCase.trim.replaceAll("\\s+", " ")).distinct.size
      assert(out.count() === distinctTexts)
      assert(out.agg(sum(lit(1) * col("n_copies"))).head().getLong(0) === docs.size)
    }
  }

  test("jaccard self-similarity is 1 and symmetric pairs agree with brute force") {
    for (seed <- 1 to 3) {
      val docs = sample(Gen.listOfN(6, doc), seed)
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
        .toDF("doc_id", "text")
      val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", 2, 0.0)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      // brute-force reference on the driver
      def shingles(d: String): Set[String] = {
        val ws = d.toLowerCase.trim.replaceAll("\\s+", " ").split(" ").toSeq
        if (ws.length < 2) Set(ws.mkString(" "))
        else ws.sliding(2).map(_.mkString(" ")).toSet
      }
      for (i <- docs.indices; j <- docs.indices if i < j) {
        val (a, b) = (shingles(docs(i)), shingles(docs(j)))
        val expected = a.intersect(b).size.toDouble / a.union(b).size.toDouble
        val got = pairs.getOrElse((i.toLong, j.toLong), 0.0)
        assert(math.abs(got - expected) < 1e-12,
          s"pair ($i,$j): got $got expected $expected")
      }
    }
  }

  test("minhash signature minima are permutation-invariant (set semantics)") {
    for (seed <- 1 to 5) {
      val d = sample(doc, seed)
      val words = d.split(" ")
      val shuffled = scala.util.Random.shuffle(words.toList).mkString(" ")
      // Same token MULTISET in different order -> same shingle SET only if
      // we compare sets; instead check the simhash of a reordered doc with
      // identical token multiset has identical token votes.
      val df = Seq((1L, d), (2L, shuffled)).toDF("doc_id", "text")
      val sh = Dedup.simhashFrame(df, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sh(1L) === sh(2L)) // simhash is order-free over the multiset
    }
  }

  test("hash60 stays within 60 bits and matches the Scala twin") {
    for (seed <- 1 to 10) {
      val s = sample(word, seed)
      val engine = Seq(s).toDF("x")
        .select(TextOps.hash60(col("x"))).head().getLong(0)
      assert(engine === TextOps.hash60Scala(s))
      assert(engine >= 0 && engine < (1L << 60))
    }
  }
}
