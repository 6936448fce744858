package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps._

/** Deduplication operators for large-scale corpus cleaning.
  *
  * Scale design (the 100 TB contract): no operator here ever forms the
  * all-pairs cross product. Candidate generation is always a shuffle on a
  * *bucket key* — normalized-text hash (exact), LSH band key (minhash),
  * simhash band (hamming), shared shingle (jaccard) — so the shuffle is
  * proportional to data + candidate pairs, not n². Exact verification runs
  * only on bucket-collision candidates, against per-doc shingle arrays
  * carried through the join (array_intersect on two ~doc-length arrays),
  * never a re-explode of the corpus.
  */
object Dedup {

  /** Exact dedup: one surviving row (minimum id) per normalized text.
    *
    * groupBy on md5(normalized) rather than the full text keeps the
    * shuffle key 16 bytes instead of document-sized at 100 TB; the
    * representative id is a plain min aggregate (map-side partial).
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), col(textCol), md5(normalize(col(textCol))).as("__h"))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("__h")

  /** Minhash signature column: `numHashes` salted-hash minima over the
    * document's shingle set. Pure column expression — one pass, no UDF.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(shingles, s => hash60Salted(s, i)))): _*)

  /** MinHash-LSH near-duplicate pairs.
    *
    * shingle → minhash(bands × rowsPerBand) → band-key bucket join →
    * exact-Jaccard verify ≥ `threshold`. Docs sharing no band never meet.
    *
    * @return (idA, idB, jaccard) with idA < idB.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleK: Int, bands: Int, rowsPerBand: Int,
                      threshold: Double): DataFrame = {
    val sig = df.select(
      col(idCol).as("id"),
      wordShingles(col(textCol), shingleK).as("shingles"))
      .withColumn("sig", minhashSignature(col("shingles"), bands * rowsPerBand))
    // One row per (doc, band): band key = the band's signature slice.
    val banded = sig.select(
      col("id"), col("shingles"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws("_", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
        .as(Seq("band", "key")))
    val a = banded.select(col("band"), col("key"),
      col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = banded.select(col("band"), col("key"),
      col("id").as("id_b"), col("shingles").as("sh_b"))
    // Bucket join on (band, key); a<b orients each unordered pair once.
    // The same pair can collide in several bands -> distinct before verify.
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 60-bit simhash of the token multiset: bit j is set when the sum of
    * (+1 / -1) votes from each token's hash bit j is non-negative.
    * Token multiplicity weights the vote (term frequency).
    */
  def simhash(text: Column): Column = {
    val tokenHashes = transform(tokens(text), t => hash60(t))
    // One ±1 vote fold per bit, built Scala-side (j is a plan-time
    // constant, so each fold is a codegen'd sequential loop). For corpora
    // of very long documents, the explode + 60-partial-sum groupBy variant
    // trades expression width for a map-side-combined shuffle.
    (0 until 60).map { j =>
      when(
        aggregate(tokenHashes, lit(0L),
          (acc, h) =>
            acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
          >= 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** SimHash near-duplicate pairs: docs whose 60-bit simhashes lie within
    * `maxHamming`. Candidates come from 4 × 15-bit band collisions (a doc
    * pair within hamming ≤ 3 of a 4-band split must agree exactly on at
    * least one band — pigeonhole), then the true hamming distance filters.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val banded = sigs.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sh"), b * 15).bitwiseAND(0x7FFF)): _*))
        .as(Seq("band", "key")))
    val a = banded.select(col("band"), col("key"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("key"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard similarity join: pairs with Jaccard ≥ `threshold`
    * over distinct word k-shingles.
    *
    * Candidate generation is the inverted-index join (docs sharing ≥1
    * shingle), with intersection counted by the join itself — the shuffle
    * is on the shingle, so disjoint docs never pair. The shingle-frequency
    * skew cap (`maxShingleDf`) drops shingles present in more than that
    * many docs from *candidate generation only* (they'd pair everything
    * with everything — the classic stop-shingle blowup); the exact Jaccard
    * is then recomputed from the full arrays, so the cap affects recall of
    * candidates, never the reported similarity.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleK: Int, threshold: Double,
                        maxShingleDf: Long = Long.MaxValue): DataFrame = {
    val sets = df.select(col(idCol).as("id"),
      wordShingles(col(textCol), shingleK).as("sh"))
    val inv = sets.select(col("id"), explode(col("sh")).as("s"))
    val filtered =
      if (maxShingleDf == Long.MaxValue) inv
      else {
        // The *frequent* shingle set is tiny (stop-shingles) -> broadcast
        // anti-join; never shuffle the inverted index against it.
        val stop = inv.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxShingleDf).select("s")
        inv.join(broadcast(stop), Seq("s"), "left_anti")
      }
    val cand = filtered.as("x").join(filtered.as("y"), Seq("s"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cand
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding-cosine near-duplicate pairs within a bucket column (e.g. a
    * cluster/label id, or an LSH bucket from [[Similarity.hyperplaneBucket]]).
    * The join key is the bucket — all-pairs never forms. Cosine is the
    * explicit sequential double fold from [[Similarity.cosine]], so results
    * are bit-exact against any engine evaluating the same fold.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            bucketCol: String, threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(bucketCol).as("bucket"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val a = v.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = v.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
