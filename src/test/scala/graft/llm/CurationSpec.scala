package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Joins

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(sf("documents"))

  test("hashSplit labels every row, rejects bad percents, and is " +
    "partitioning-invariant") {
    val split = Curation.hashSplit(docs, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(split.filter(col("split").isNull).count() === 0)
    val byName = split.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(byName.keySet === Set("train", "val", "test"))
    assert(byName("train") > byName("val")) // 80% dwarfs 10% at n=100
    // Same rows land in the same split regardless of physical layout.
    val reparted = Curation.hashSplit(docs.repartition(13), "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(split.select("doc_id", "split")
      .except(reparted.select("doc_id", "split")).count() === 0)
    intercept[IllegalArgumentException] {
      Curation.hashSplit(docs, "doc_id", Seq("a" -> 50, "b" -> 40))
    }
  }

  test("quotaSample keeps at most quota per key, deterministically") {
    val q = Curation.quotaSample(docs, "lang", "doc_id", quota = 7)
    val counts = q.groupBy("lang").count().as[(String, Long)].collect()
    assert(counts.forall(_._2 <= 7))
    val again = Curation.quotaSample(docs.repartition(11), "lang", "doc_id", 7)
    assert(q.select("doc_id").except(again.select("doc_id")).count() === 0)
  }

  test("packByTokenBudget matches the naive global-window prefix sum") {
    val withTokens = docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).as("n_tokens"))
    val packed = Curation.packByTokenBudget(withTokens, "doc_id", "n_tokens",
      budget = 500L, prefixBits = 4)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    // Naive reference: one global ordered pass on the driver.
    val ordered = withTokens
      .withColumn("h", TextOps.hash60(col("doc_id").cast("string")))
      .select("doc_id", "n_tokens", "h").as[(Long, Int, Long)]
      .collect().sortBy(r => (r._3, r._1))
    var cum = 0L
    ordered.foreach { case (id, n, _) =>
      assert(packed(id) === cum / 500L, s"doc $id")
      cum += n
    }
    // Every shard except the last is filled to at least the budget minus
    // one doc (no premature shard break).
    val shardTotals = ordered.map { case (id, n, _) => (packed(id), n.toLong) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val lastShard = shardTotals.keys.max
    val maxDoc = ordered.map(_._2).max
    shardTotals.filter(_._1 != lastShard).values
      .foreach(t => assert(t + maxDoc >= 500L))
  }

  test("decontaminate drops exactly the docs sharing a shingle with the " +
    "benchmark") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "totally unrelated words here"),
      (3L, "beta gamma delta epsilon")).toDF("id", "text")
    val bench = Seq((100L, "alpha beta gamma zeta")).toDF("id", "text")
    // doc 1 shares shingle "alpha beta gamma"; doc 3 shares none of the
    // 3-shingles with bench; doc 2 shares nothing.
    val out = Curation.decontaminate(corpus, bench, "id", "text", 3)
      .select("id").as[Long].collect().toSet
    assert(out === Set(2L, 3L))
  }

  test("decontaminateNearDup drops whole-document near-matches only: a " +
    "doc sharing one phrase with the benchmark survives") {
    val corpus = Seq(
      // Near-verbatim copy of the benchmark doc (one word appended):
      // jaccard well above 0.5 -> dropped.
      (1L, "alpha beta gamma delta epsilon zeta eta theta extra"),
      // Shares ONLY the leading phrase (3 of its many shingles): the
      // exact variant would drop it; near-dup keeps it.
      (2L, "alpha beta gamma delta completely different tail of words " +
        "stretching far beyond any overlap with the benchmark document"),
      (3L, "totally unrelated vocabulary everywhere")).toDF("id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("id", "text")
    val out = Curation.decontaminateNearDup(corpus, bench, "id", "text",
      shingleK = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
      .select("id").as[Long].collect().toSet
    assert(out === Set(2L, 3L))
    // Cross-check the phrase-sharing claim: the exact variant DOES drop 2.
    val exact = Curation.decontaminate(corpus, bench, "id", "text", 3)
      .select("id").as[Long].collect().toSet
    assert(exact === Set(3L))
    // The pair frame orients (corpus, bench) and reports the jaccard.
    val pairs = Dedup.minhashLshPairsAcross(corpus, bench, "id", "text",
      3, 8, 2, 0.5).collect()
    assert(pairs.length === 1)
    assert(pairs(0).getLong(0) === 1L && pairs(0).getLong(1) === 100L)
    assert(pairs(0).getDouble(2) > 0.5)
    // Broadcast guard: with the threshold forced below the right side's
    // size the hint is dropped (AQE picks the sides) and the pair set is
    // unchanged — the fallback changes the plan, never the answer.
    val shuffled = Dedup.minhashLshPairsAcross(corpus, bench, "id", "text",
      3, 8, 2, 0.5, maxBroadcastRight = 0L)
    assert(!shuffled.queryExecution.analyzed.toString
      .contains("ResolvedHint"), "hint must be dropped above the threshold")
    val sp = shuffled.collect()
    assert(sp.length === 1 && sp(0).getLong(0) === 1L &&
      sp(0).getLong(1) === 100L && sp(0).getDouble(2) === pairs(0).getDouble(2))
  }

  test("dsirLogWeights: target-like docs out-score off-target docs; " +
    "weights match a plain-Scala reference") {
    val corpus = Seq(
      (1L, "the quick brown fox", "en"),
      (2L, "the lazy brown dog", "en"),
      (3L, "der schnelle braune fuchs", "de"),
      (4L, "der faule braune hund", "de")).toDF("doc_id", "text", "lang")
    val out = Curation.dsirLogWeights(corpus,
      corpus.filter($"lang" === "en"), "doc_id", "text", nBuckets = 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // Direction: both English docs above both German docs.
    assert(Seq(1L, 2L).map(out(_)._2).min > Seq(3L, 4L).map(out(_)._2).max)
    // Exact values against an independent reference implementation.
    def h60(s: String): Long = TextOps.hash60Scala(s)
    def grams(t: String): Seq[Long] = {
      val ws = t.split(" ").toSeq
      (ws ++ ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
        .filter(_.nonEmpty).map(g => h60(g) % 64)
    }
    val all = Seq(1L -> "the quick brown fox", 2L -> "the lazy brown dog",
      3L -> "der schnelle braune fuchs", 4L -> "der faule braune hund")
    val en = all.take(2)
    val cr = all.flatMap(x => grams(x._2)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val ct = en.flatMap(x => grams(x._2)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val nr = cr.values.sum; val nt = ct.values.sum
    def u(b: Long): Long = math.floor(math.log(
      ((ct.getOrElse(b, 0L) + 1L) * (nr + 64)).toDouble /
        ((cr(b) + 1L) * (nt + 64)).toDouble) * 1e6 + 0.5).toLong
    val expected = all.map { case (id, t) =>
      id -> ((grams(t).size.toLong, grams(t).map(u).sum)) }.toMap
    assert(out === expected)
  }

  test("vocabTopK returns highest-count tokens with deterministic ties") {
    val df = Seq("a a a b b c", "b c d", "  A  ").toDF("text")
    val top = Curation.vocabTopK(df, "text", 3).as[(String, Long)].collect()
    assert(top.toSeq === Seq(("a", 4L), ("b", 3L), ("c", 2L)))
    val plan = Curation.vocabTopK(docs, "text", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("bpePairCounts ranks adjacent pairs with deterministic ties and no window") {
    // "a b" x3 (two in doc1, one in doc2), "b a" x2, "b c" x1, "c a" x1;
    // the 1-token doc contributes no pairs.
    val df = Seq("a b a b c a", "b a b", "solo").toDF("text")
    val top = Curation.bpePairCounts(df, "text", 3)
      .as[(String, Long, String)].collect().toSeq
    assert(top === Seq(("a b", 3L, "ab"), ("b a", 2L, "ba"), ("b c", 1L, "bc")))
    // k beyond distinct pairs returns them all; merged strips the space.
    assert(Curation.bpePairCounts(df, "text", 100).count() === 4)
    // Scale shape: bounded top-k, not a global sort or window.
    val plan = Curation.bpePairCounts(docs, "text", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") && !plan.contains("Window"))
  }

  test("clusterSplit assigns whole clusters to one split; singletons by own id") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(100).toDF("doc_id")
    // Two clusters: {1,2,3} labeled 1 and {10,11} labeled 10.
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val out = Curation.clusterSplit(docs, clusters, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("doc_id", "split_key", "split")
      .as[(Long, Long, String)].collect()
    assert(out.length === 100)
    val byId = out.map(r => r._1 -> r).toMap
    // Cluster members share the key AND the split — no straddling.
    assert(Seq(1L, 2L, 3L).map(byId(_)._3).distinct.size === 1)
    assert(Seq(10L, 11L).map(byId(_)._3).distinct.size === 1)
    assert(byId(2L)._2 === 1L && byId(11L)._2 === 10L)
    // A singleton splits by its own id — same label hashSplit gives it.
    val plain = Curation.hashSplit(docs.filter($"doc_id" === 50L), "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("split").as[String].head()
    assert(byId(50L)._3 === plain)
  }

  test("negativeSample: never self or a positive, deterministic, up-to-k") {
    import org.apache.spark.sql.functions._
    val corpus = spark.range(200).toDF("id")
    val queries = corpus.filter($"id" < 5)
    val positives = corpus.select($"id", ($"id" + 1).as("pos"))
    val out = Curation.negativeSample(corpus, queries, positives,
      "id", k = 4, nBuckets = 10, salt = 1)
      .as[(Long, Int, Long)].collect()
    assert(out.nonEmpty && out.length <= 20) // <= 5 queries x 4 slots
    assert(out.forall { case (q, _, n) => n != q && n != q + 1 })
    // Pure function of (corpus, salt): partitioning cannot move it.
    val out2 = Curation.negativeSample(corpus.repartition(7), queries,
      positives, "id", k = 4, nBuckets = 10, salt = 1)
      .as[(Long, Int, Long)].collect()
    assert(out.toSet === out2.toSet)
    // A different salt draws a different sample.
    val out3 = Curation.negativeSample(corpus, queries, positives,
      "id", k = 4, nBuckets = 10, salt = 2)
      .as[(Long, Int, Long)].collect()
    assert(out.toSet !== out3.toSet)
    // A slot whose whole bucket is excluded yields no row: corpus {0,1},
    // query 0, positive (0,1) -> every candidate is self or positive.
    val tiny = Seq(0L, 1L).toDF("id")
    assert(Curation.negativeSample(tiny, tiny.filter($"id" === 0),
      Seq((0L, 1L)).toDF("id", "pos"), "id", k = 3, nBuckets = 2)
      .count() === 0)
  }

  test("lengthBuckets assigns quantile length classes, ties to the upper bucket") {
    // Lengths 1..8, 4 buckets: boundaries p25/p50/p75 of {1..8} =
    // 2.75 / 4.5 / 6.25 -> two docs per class.
    val df = (1 to 8).map(n => (n.toLong, Seq.fill(n)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.lengthBuckets(df, "doc_id", "text", 4)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(out.map(_._3).toSeq === Seq(0, 0, 1, 1, 2, 2, 3, 3))
    assert(out.map(_._2).toSeq === (1L to 8L))
    // A length exactly ON a boundary lands in the upper bucket.
    val tie = Seq((1L, "a"), (2L, "a b"), (3L, "a b c")).toDF("doc_id", "text")
    // boundaries of {1,2,3} at p25/p50/p75 = 1.5 / 2.0 / 2.5: len 2 meets
    // the 2.0 boundary -> bucket 2.
    assert(Curation.lengthBuckets(tie, "doc_id", "text", 4)
      .as[(Long, Long, Int)].collect().sortBy(_._1).map(_._3).toSeq
      === Seq(0, 2, 3))
    intercept[IllegalArgumentException] {
      Curation.lengthBuckets(df, "doc_id", "text", 1)
    }
  }

  test("uniformSample: exact k, deterministic, salt-decorrelated, heap plan") {
    val df = spark.range(1000).toDF("id")
    val s1 = Curation.uniformSample(df, "id", 50, salt = 1)
    val rows1 = s1.as[Long].collect().toSet
    assert(rows1.size === 50)
    // Deterministic: same salt, same rows — on a different partitioning too.
    assert(Curation.uniformSample(df.repartition(7), "id", 50, salt = 1)
      .as[Long].collect().toSet === rows1)
    // Distinct salts give (near-)independent samples.
    val rows2 = Curation.uniformSample(df, "id", 50, salt = 2)
      .as[Long].collect().toSet
    assert(rows1 !== rows2)
    // Bounded heaps, no global sort.
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("bpeTrain chains rules: each round counts over prior merges") {
    // Round 1 over "a a a b / a a b b": pairs a·a x3 ("a a a" greedy
    // yields ONE merge in doc1), a·b x2, b·b x1 → rule1 = (a,a)→aa (n=3).
    // After greedy round 1: doc1 = [aa, a, b], doc2 = [aa, b, b] — so
    // round 2 counts aa·a 1, aa·b 1, a·b 1, b·b 1 → rule2 = "a b" (tie
    // on n=1 broken lexically) — only derivable from the MERGED streams.
    val df = Seq((1L, "a a a b"), (2L, "a a b b")).toDF("doc_id", "text")
    val rules = Curation.bpeTrain(df, "doc_id", "text", 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(rules(0) === ((1, "a a", "aa", 3L)))
    assert(rules(1) === ((2, "a b", "ab", 1L)))
    // Round 3 operates on doc1 = [aa, ab], doc2 = [aa, b, b]:
    // pairs aa·ab 1, aa·b 1, b·b 1 → lexical tie-break → "aa ab".
    assert(rules(2) === ((3, "aa ab", "aaab", 1L)))
    // A corpus with fewer derivable rules than requested stops early.
    val tiny = Seq((1L, "x y")).toDF("doc_id", "text")
    val r2 = Curation.bpeTrain(tiny, "doc_id", "text", 5)
      .as[(Int, String, String, Long)].collect()
    assert(r2.length >= 1 && r2.head === ((1, "x y", "xy", 1L)))
    assert(r2.length < 5)
  }

  test("bpeEncode emits the final merged token streams at dense positions") {
    // Same corpus as the bpeTrain chaining spec; rules are (a,a)→aa,
    // (a,b)→ab, (aa,ab)→aaab, so after 3 rounds:
    //   doc1 "a a a b"  → [aa, a, b] → [aa, ab] → [aaab]
    //   doc2 "a a b b"  → [aa, b, b] (no a·b adjacency, no aa·ab)
    val df = Seq((1L, "a a a b"), (2L, "a a b b")).toDF("doc_id", "text")
    val out = Curation.bpeEncode(df, "doc_id", "text", 3)
      .as[(Long, Int, String)].collect().sorted
    assert(out === Array(
      (1L, 0, "aaab"),
      (2L, 0, "aa"), (2L, 1, "b"), (2L, 2, "b")))
    // Concatenating each doc's tokens reconstructs its normalized text
    // minus separators — merges concatenate, never drop characters.
    val rebuilt = out.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._3).mkString).toMap
    assert(rebuilt === Map(1L -> "aaab", 2L -> "aabb"))
  }

  test("termRelevance computes tf, df, and the unlogged tf-idf ratio") {
    val df = Seq((1L, "cat cat dog"), (2L, "dog fish"), (3L, "cat")).toDF("id", "text")
    val out = TextAnalysis.termRelevance(df, "id", "text")
      .as[(Long, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._6)).toMap
    assert(out((1L, "cat")) === ((2L, 2L, 3.0)))  // tf=2, df=2, 2*3/2
    assert(out((2L, "fish")) === ((1L, 1L, 3.0))) // tf=1, df=1, 1*3/1
    assert(out((3L, "cat")) === ((1L, 2L, 1.5)))
    // 5 distinct (doc, token) pairs: (1,cat),(1,dog),(2,dog),(2,fish),(3,cat)
    assert(out.size === 5)
    // minDf prunes rare terms
    val pruned = TextAnalysis.termRelevance(df, "id", "text", minDf = 2L)
    assert(pruned.select("token").distinct().as[String].collect().toSet
      === Set("cat", "dog"))
  }

  test("recallAtK is 1.0 for identical results, 0 for disjoint, fractional otherwise") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "cand_id")
    val same = Similarity.recallAtK(exact, exact, k = 2)
      .as[(Long, Double)].collect().toMap
    assert(same === Map(1L -> 1.0, 2L -> 1.0))
    val disjoint = Seq((1L, 99L), (2L, 98L)).toDF("query_id", "cand_id")
    assert(Similarity.recallAtK(exact, disjoint, k = 2)
      .as[(Long, Double)].collect().toMap === Map(1L -> 0.0, 2L -> 0.0))
    val half = Seq((1L, 10L), (2L, 99L)).toDF("query_id", "cand_id")
    assert(Similarity.recallAtK(exact, half, k = 2)
      .as[(Long, Double)].collect().toMap === Map(1L -> 0.5, 2L -> 0.0))
  }

  test("chunkByTokens covers every token with the declared overlap") {
    // 10 tokens, chunk 4, overlap 1 (stride 3): starts at 1, 4, 7 ->
    // [a b c d] [d e f g] [g h i j] — the last chunk reaches token 10,
    // so no redundant overlap-only tail chunk is emitted.
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "x y")).toDF("doc_id", "text")
    val out = Curation.chunkByTokens(df, "doc_id", "text", 4, 1)
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getString(3)).toSeq ===
      Seq("a b c d", "d e f g", "g h i j"))
    assert(d1.map(_.getInt(2)).toSeq === Seq(4, 4, 4))
    // shorter than one chunk -> exactly one chunk, untruncated
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length === 1 && d2.head.getString(3) === "x y"
      && d2.head.getInt(2) === 2)
    // exact multiple: 6 tokens, chunk 3, overlap 0 -> two full chunks
    val exact = Curation.chunkByTokens(
      Seq((1L, "a b c d e f")).toDF("doc_id", "text"), "doc_id", "text", 3, 0)
      .orderBy("chunk_id").collect()
    assert(exact.map(_.getString(3)).toSeq === Seq("a b c", "d e f"))
  }

  test("domainMixSample keeps rate-proportional counts, deterministically") {
    val docs = spark.read.parquet(sf("documents"))
    val mixed = Curation.domainMixSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "zh" -> 0.0), defaultWeight = 0.5)
    val byLang = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") === full("en"))          // weight 1.0: kept whole
    assert(!byLang.contains("zh"))               // weight 0.0: dropped
    // default 0.5 on the rest: loose binomial band
    val restKept = byLang.filterNot(_._1 == "en").values.sum.toDouble
    val restFull = full.filterNot(k => k._1 == "en" || k._1 == "zh").values.sum
    assert(restKept / restFull > 0.3 && restKept / restFull < 0.7)
    // Partitioning-invariant: same rows regardless of layout.
    val re = Curation.domainMixSample(docs.repartition(7), "doc_id", "lang",
      Map("en" -> 1.0, "zh" -> 0.0), defaultWeight = 0.5)
    assert(re.select("doc_id").exceptAll(mixed.select("doc_id")).count() === 0)
    assert(mixed.select("doc_id").exceptAll(re.select("doc_id")).count() === 0)
  }

  test("sampler salts decorrelate: same salt re-keeps, distinct salt thins") {
    val docs = spark.read.parquet(sf("documents"))
    val once = Curation.domainMixSample(docs, "doc_id", "lang",
      Map.empty, defaultWeight = 0.5)
    // Same salt: the second filter re-tests the SAME buckets — keeps
    // min(r, r) = everything already kept (fully correlated, no thinning).
    val sameSalt = Curation.domainMixSample(once, "doc_id", "lang",
      Map.empty, defaultWeight = 0.5)
    assert(sameSalt.count() === once.count())
    // Distinct salt: independent decision — thins by ~r2.
    val rethinned = Curation.domainMixSample(once, "doc_id", "lang",
      Map.empty, defaultWeight = 0.5, salt = "mix2:")
    val frac = rethinned.count().toDouble / once.count()
    assert(frac > 0.35 && frac < 0.65, s"chained keep rate $frac not ~0.5")
  }

  test("scoreWeightedSample keeps proportionally to the clamped score") {
    val rows = (0L until 4000L).map { i =>
      val score = (i % 4) match {
        case 0 => 1.5   // clamps to 1.0: always kept
        case 1 => 1.0   // floors to exactly 1e6: always kept
        case 2 => 0.5
        case _ => -0.2  // clamps to 0: never kept
      }
      (i, score)
    }.toDF("id", "score")
    val kept = Curation.scoreWeightedSample(rows, "id", "score")
    val byScore = kept.groupBy("score").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(byScore(1.5) === 1000L)
    assert(byScore(1.0) === 1000L)
    assert(!byScore.contains(-0.2))
    assert(byScore(0.5) > 350 && byScore(0.5) < 650)
    // Partitioning-invariant.
    val re = Curation.scoreWeightedSample(rows.repartition(7), "id", "score")
    assert(re.select("id").exceptAll(kept.select("id")).count() === 0)
    assert(kept.select("id").exceptAll(re.select("id")).count() === 0)
  }

  test("scoreWeightedSample drops NaN scores instead of clamping to 1") {
    // A bare least/greatest clamp would pass NaN through as 1.0 (Spark
    // orders NaN above every double) — keeping exactly the rows whose
    // quality signal failed.
    val rows = Seq((1L, Double.NaN), (2L, 1.0), (3L, Double.NaN))
      .toDF("id", "score")
    val kept = Curation.scoreWeightedSample(rows, "id", "score")
      .select("id").collect().map(_.getLong(0))
    assert(kept === Array(2L))
  }

  test("bpeApplyMerge is greedy left-to-right, exact on self-overlap") {
    def merged(text: String, a: String, b: String): Seq[String] =
      Curation.bpeApplyMerge(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", a, b)
        .orderBy("pos").collect().map(_.getString(2)).toSeq
    // Self-overlapping rule: odd run keeps the tail, even run pairs up —
    // a string replace would produce [aa, a, aa] on the 6-run.
    assert(merged("a a a", "a", "a") === Seq("aa", "a"))
    assert(merged("a a a a", "a", "a") === Seq("aa", "aa"))
    assert(merged("a a a a a a", "a", "a") === Seq("aa", "aa", "aa"))
    // Plain rule in context; merged symbol does not re-merge this pass.
    assert(merged("x a b a b y", "a", "b") === Seq("x", "ab", "ab", "y"))
    assert(merged("a b b", "a", "b") === Seq("ab", "b"))
    // No occurrence: stream unchanged.
    assert(merged("p q r", "a", "b") === Seq("p", "q", "r"))
  }

  test("bpePairCountsAfterMerge counts pairs of the re-merged stream") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b c")).toDF("doc_id", "text")
    // Rule (a,b): streams become [ab, ab, c] and [ab, c].
    val out = Curation.bpePairCountsAfterMerge(docs, "doc_id", "text",
      "a", "b", 10).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("ab c", 2L), ("ab ab", 1L)))
  }

  test("dsirLogWeights exact-λ guard: loud at overflow magnitudes, " +
    "silent at sane ones") {
    Curation.requireDsirExact(1000000L, 1000000L, 1024) // no throw
    // 4e9 x 3e9 gram streams: the λ product tops 1.2e19 > Long.MaxValue.
    val e = intercept[IllegalArgumentException] {
      Curation.requireDsirExact(4000000000L, 3000000000L, 1024)
    }
    assert(e.getMessage.contains("Sample"))
  }

  test("mixToProportions keeps the binding domain whole and hits targets") {
    val docs = spark.read.parquet(sf("documents"))
    val targets = Map("en" -> 0.5, "zh" -> 0.3, "es" -> 0.2)
    val mixed = Curation.mixToProportions(docs, "doc_id", "lang", targets)
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Untargeted domains are dropped entirely.
    assert(!kept.contains("de") && !kept.contains("fr"))
    // The binding domain (min n/t) survives whole; ppm floors to 1e6.
    val binding = targets.keys.minBy(d => full(d) / targets(d))
    assert(kept(binding) === full(binding))
    // Each kept count is within a loose binomial band of its target.
    val total = kept.values.sum.toDouble
    targets.foreach { case (d, t) =>
      assert(math.abs(kept(d) / total - t) < 0.15,
        s"$d share ${kept(d) / total} far from target $t")
    }
  }

  test("trainQualityClassifier learns a separable marker and is " +
    "partitioning-invariant") {
    // 40 docs: positives all contain the marker token, negatives never.
    val rows = (0 until 40).map { i =>
      val y = i % 2
      val base = s"alpha beta gamma doc$i common words here"
      (i.toLong, if (y == 1) s"$base marker" else base, y)
    }.toDF("id", "text", "y")
    val model = Curation.trainQualityClassifier(rows, "id", "text", "y",
      iters = 10, lr = 4.0)
    val scored = Curation.scoreQualityClassifier(rows, model, "id", "text")
      .join(rows.select(col("id"), col("y")), Seq("id"))
    // A separable marker must be fully learned in 10 rounds.
    assert(scored.filter(col("pred") =!= col("y")).count() === 0)
    // The marker's unigram bucket carries the largest positive weight
    // (the "here marker" bigram bucket has the same document frequency,
    // so it TIES — assert max-weight membership, not a unique top row).
    val marker = TextOps.hash60Scala("marker") match {
      case h => ((h % 1024) + 1024) % 1024
    }
    val weights = model.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weights(marker) === weights.values.max,
      s"marker bucket $marker (${weights(marker)}) below max " +
        s"${weights.values.max}")
    // Training is a pure function of the data, not the layout.
    val model13 = Curation.trainQualityClassifier(rows.repartition(13),
      "id", "text", "y", iters = 10, lr = 4.0)
    assert(model.except(model13).count() === 0 &&
      model13.except(model).count() === 0)
  }

  test("epochMix fills each domain budget to within one document") {
    val rows = (0 until 60).map { i =>
      (i.toLong, s"dom${i % 3}", 10L + i % 7)
    }.toDF("id", "dom", "ntok")
    val budgets = Seq(("dom0", 500L), ("dom1", 80L), ("dom2", 10000L))
      .toDF("dom", "budget")
    val mix = Curation.epochMix(rows, "id", "ntok", "dom", budgets)
    val perDom = mix.groupBy("dom")
      .agg(sum(col("n_tokens")).as("got"), max(col("epoch")).as("maxe"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val budget = Map("dom0" -> 500L, "dom1" -> 80L, "dom2" -> 10000L)
    val totals = rows.groupBy("dom").agg(sum(col("ntok")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perDom.foreach { case (d, (got, maxe)) =>
      // Greedy fill: never over budget, under by at most one max doc.
      assert(got <= budget(d), s"$d overfilled: $got > ${budget(d)}")
      assert(got >= budget(d) - 16, s"$d underfilled: $got")
      assert(maxe === budget(d) / totals(d), s"$d epoch count")
    }
    // Every doc appears exactly ne or ne+1 times in its domain.
    val counts = mix.groupBy("dom", "id").count()
      .select(col("dom"), col("count")).distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    counts.foreach { case (d, c) =>
      val ne = budget(d) / totals(d)
      assert(c == ne || c == ne + 1, s"$d doc repeated $c times (ne=$ne)")
    }
    // Pure function of the data, not the physical layout.
    val mix13 = Curation.epochMix(rows.repartition(13), "id", "ntok",
      "dom", budgets)
    assert(mix.except(mix13).count() === 0 &&
      mix13.except(mix).count() === 0)
  }

  test("epochMix fails loud on a pathological budget instead of " +
    "exploding a giant epoch array") {
    val rows = Seq((1L, "tiny", 500L), (2L, "tiny", 500L))
      .toDF("id", "dom", "ntok")
    // 1e12-token budget against a 1e3-token domain -> ne = 1e9: the
    // sequence() fan-out would materialize an 8 GB array per row.
    val budgets = Seq(("tiny", 1000000000000L)).toDF("dom", "budget")
    val e = intercept[Exception] {
      Curation.epochMix(rows, "id", "ntok", "dom", budgets).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("unit mistake")),
      s"wrong failure: ${msgs(e).mkString(" | ")}")
    // At the cap boundary the guard stays silent.
    val ok = Seq(("tiny", 1000L * Curation.MaxEpochs))
      .toDF("dom", "budget")
    assert(Curation.epochMix(rows, "id", "ntok", "dom", ok)
      .groupBy("id").count().collect()
      .forall(_.getLong(1) === Curation.MaxEpochs))
  }

  test("bpeEncodeFrozen against the corpus-trained artifact equals the " +
    "inline encode; pin cadence is result-invisible") {
    val root = java.nio.file.Files.createTempDirectory("bpetok").toString
    try {
      Curation.writeBpeTokenizer(docs, "doc_id", "text", nMerges = 3, root)
      val frozen = Curation.bpeEncodeFrozen(spark, root, docs,
        "doc_id", "text")
      val inline = Curation.bpeEncode(docs, "doc_id", "text", nMerges = 3)
      assert(frozen.except(inline).count() === 0 &&
        inline.except(frozen).count() === 0)
      // Expression-depth pinning must not change results.
      val pinned = Curation.bpeEncodeFrozen(spark, root, docs,
        "doc_id", "text", pinEvery = 1)
      assert(pinned.except(inline).count() === 0 &&
        inline.except(pinned).count() === 0)
      // The artifact records the rule count it was trained with.
      assert(spark.read.parquet(s"$root/meta").head().getInt(0) === 3)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root))
  }

  test("classifier scoring plan: broadcast model join, no Scala UDF") {
    val labeled = docs.withColumn("y",
      (col("doc_id") % 2).cast("int"))
    val model = Curation.trainQualityClassifier(labeled, "doc_id", "text",
      "y", iters = 1, lr = 1.0)
    val plan = Curation.scoreQualityClassifier(docs, model,
      "doc_id", "text").queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"model join is not broadcast:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("UDF("),
      s"Scala UDF in the scoring plan:\n$plan")
  }

  test("epochMix plan: offsets and plan frames broadcast back, full " +
    "epochs explode without a join shuffle on the data side") {
    val rows = (0 until 200).map(i => (i.toLong, s"dom${i % 4}", 10L))
      .toDF("id", "dom", "ntok")
    val budgets = (0 until 4).map(i => (s"dom$i", 1200L)).toDF("dom", "budget")
    val plan = Curation.epochMix(rows, "id", "ntok", "dom", budgets)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"offset/plan frames not broadcast:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"Scala UDF present:\n$plan")
  }

  test("binaryAuc matches the hand-computed tie-aware rank statistic") {
    // pos scores {3, 2}, neg scores {2, 1}: pairs win/win/tie/win
    // -> AUC = 3.5/4 = 0.875 (7 half-units over 2*2*2).
    val scored = Seq((3L, 1), (2L, 0), (2L, 1), (1L, 0))
      .toDF("score", "y")
    val r = Curation.binaryAuc(scored, "score", "y").collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 7L)
    assert(r.getDouble(3) === 0.875)
    // Partitioning-invariant (exact integer path).
    val r13 = Curation.binaryAuc(scored.repartition(13), "score", "y")
      .collect()(0)
    assert(r13.getLong(2) === 7L)
  }

  test("requireAucExact refuses past the exact long numerator bound") {
    val e = intercept[IllegalArgumentException] {
      Curation.requireAucExact(2500000000L, 2500000000L) // 2PN ~ 1.25e19
    }
    assert(e.getMessage.contains("sample"))
    Curation.requireAucExact(2000000000L, 2000000000L) // 8e18 < 9e18: fine
    Curation.requireAucExact(0L, 0L) // degenerate input never throws here
  }

  test("requireClfExact refuses past exact-double gradient range") {
    val e = intercept[IllegalArgumentException] {
      Curation.requireClfExact(3000000000L, 4.0)
    }
    assert(e.getMessage.contains("sample"))
    Curation.requireClfExact(2000000000L, 4.0) // inside the bound: fine
  }

  test("rangeJoinBucketed equals the plain theta range join") {
    val points = (0L to 300L by 7L).toDF("p")
    val intervals = Seq((0L, 49L, "a"), (25L, 60L, "b"), (200L, 300L, "c"))
      .toDF("lo", "hi", "tag")
    val theta = Joins.rangeJoin(points, intervals, $"p", $"lo", $"hi")
      .select("p", "tag")
    val bucketed = Joins.rangeJoinBucketed(points, intervals, "p", "lo", "hi",
      width = 16L).select("p", "tag")
    assert(bucketed.except(theta).count() === 0)
    assert(theta.except(bucketed).count() === 0)
    assert(bucketed.count() === theta.count())
  }
}
