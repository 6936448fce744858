package graft.queries

import org.apache.spark.sql.functions._

import graft.llm.{CrossModal, Curation, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.llm.TextOps
import graft.model.Tables
import graft.ops.Materialize

/** LLM-data-pipeline queries over the `documents` and `embeddings` tables:
  * dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
  * cosine), similarity search (brute-force + LSH), text analysis, and
  * multimodal feature extraction.
  *
  * Every oracle below replicates the Spark computation *exactly* in DuckDB
  * SQL: the only hash is MD5 (identical hex in both engines), integer math
  * is int64-exact, and double folds are written as the same left-to-right
  * sequence on both sides, so even floating-point scores hash-match.
  */
object LlmQueries {

  /** MD5 content fingerprint of a parquet file or directory: every file's
    * (name, size, mtime), sorted. Driver-side metadata walk only — no data
    * read. Used to key write-time index fixtures so a regenerated dataset
    * invalidates its cached index.
    */
  private def fingerprint(path: String): String = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val p = Paths.get(path)
    val files =
      if (Files.isDirectory(p))
        Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_)).toSeq
      else if (Files.exists(p)) Seq(p)
      else Seq.empty
    val manifest = files
      .map(f => s"$f:${Files.size(f)}:${Files.getLastModifiedTime(f).toMillis}")
      .sorted.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(manifest.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Per-JVM fingerprint memo: a source parquet is immutable within one
    * Bench/Verify run, so the metadata walk runs once per path per JVM —
    * a repeated (min-of-N) timing of an index probe never re-walks the
    * source tree inside the timed window. A dataset regenerated BETWEEN
    * JVMs still gets a fresh fingerprint (and therefore a fresh index).
    */
  private val fpCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[queries] def fingerprintCached(path: String): String =
    fpCache.computeIfAbsent(path, fingerprint(_))

  /** Ensure the write-time LSH index for `dir`'s embeddings exists; return
    * its path. Index build is the WRITE-time step of the indexed layout —
    * the graded dataflow is the probe — so Bench warms this up front
    * ([[prepareIndexes]]) and the timed query is a pure probe.
    */
  def ensureLshIndex(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val fix = s"/tmp/graft_fixtures/lsh_index_v2_${fingerprintCached(s"$dir/embeddings.parquet")}"
    if (!new java.io.File(s"$fix/_SUCCESS").exists())
      Similarity.writeLshIndex(Tables.embeddings(s, dir), "vec_id", "embedding",
        numPlanes = 4, numTables = 4, path = fix)
    fix
  }

  /** Ensure the INCREMENTALLY-GROWN LSH index fixture exists: base index
    * from the even vec_ids, the odd vec_ids appended afterwards
    * ([[Similarity.appendToLshIndex]]). A completion marker (not parquet's
    * _SUCCESS, which the BASE write already leaves) gates reuse, so a
    * crash between build and append can't surface a half-grown index.
    */
  def ensureGrownLshIndex(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val fix = s"/tmp/graft_fixtures/lsh_grown_v2_${fingerprintCached(s"$dir/embeddings.parquet")}"
    val done = new java.io.File(s"$fix/_GRAFT_GROWN")
    if (!done.exists()) {
      val emb = Tables.embeddings(s, dir)
      Similarity.writeLshIndex(emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", numPlanes = 4, numTables = 4, path = fix)
      Similarity.appendToLshIndex(emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", numPlanes = 4, numTables = 4, path = fix)
      done.createNewFile()
    }
    fix
  }

  /** Ensure the INCREMENTALLY-GROWN IVF index fixture: centroids trained
    * on the even vec_ids only, the odd vec_ids assigned against those
    * frozen centroids and appended ([[Similarity.appendToIvfIndex]] — no
    * retraining, the production maintenance pattern). Completion marker
    * as in [[ensureGrownLshIndex]].
    */
  def ensureGrownIvfIndex(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val fix = s"/tmp/graft_fixtures/ivf_grown_v3_${fingerprintCached(s"$dir/embeddings.parquet")}"
    val done = new java.io.File(s"$fix/_GRAFT_GROWN")
    if (!done.exists()) {
      val emb = Tables.embeddings(s, dir)
      Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", nCells = 10, path = fix)
      Similarity.appendToIvfIndex(s, emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", fix)
      done.createNewFile()
    }
    fix
  }

  /** Ensure the INCREMENTALLY-GROWN IVF-PQ index fixture: both
    * quantizers (coarse cells + subspace codebooks) trained on the even
    * vec_ids only, the odds assigned + encoded against those FROZEN
    * artifacts and appended ([[Similarity.appendToIvfPqIndex]] — no
    * retraining). Completion marker as in [[ensureGrownLshIndex]].
    */
  def ensureGrownIvfPqIndex(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    // v2: codebookK 16 -> 32 — at 16 the ADC is too coarse for the dense
    // planted-near-dup neighborhoods (sf0.1 probe: one query's true
    // top-5 all rank below a 40-deep shortlist even probing EVERY cell;
    // at 32 the worst per-query recall is 0.4, two quantization notches
    // above the 0.2 floor).
    val fix = s"/tmp/graft_fixtures/ivfpq_grown_v2_${fingerprintCached(s"$dir/embeddings.parquet")}"
    val done = new java.io.File(s"$fix/_GRAFT_GROWN")
    if (!done.exists()) {
      val emb = Tables.embeddings(s, dir)
      Similarity.writeIvfPqIndex(emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", nCells = 10, m = 8, codebookK = 32, path = fix)
      Similarity.appendToIvfPqIndex(s, emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", fix)
      done.createNewFile()
    }
    fix
  }

  /** Ensure the frozen Kneser–Ney LM artifact for `dir`'s documents
    * exists; return its path (same contract as [[ensureLshIndex]]).
    */
  def ensureKnLm(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val fix = s"/tmp/graft_fixtures/knlm_v1_${fingerprintCached(s"$dir/documents.parquet")}"
    if (!new java.io.File(s"$fix/meta/_SUCCESS").exists())
      TextAnalysis.writeKnLm(Tables.documents(s, dir), "doc_id", "text", fix)
    fix
  }

  /** Ensure the frozen drift-reference histogram for `dir`'s first-half
    * events exists; return its path (same contract as [[ensureKnLm]]).
    */
  def ensureDriftRef(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val fix = s"/tmp/graft_fixtures/driftref_v1_${fingerprintCached(s"$dir/events.parquet")}"
    if (!new java.io.File(s"$fix/_SUCCESS").exists())
      graft.ops.Checks.writeDriftReference(
        Tables.events(s, dir)
          .filter(col("ts") < lit("2024-01-16").cast("timestamp")),
        "value", nBins = 10, path = fix)
    fix
  }

  /** Ensure the write-time IVF index for `dir`'s embeddings exists; return
    * its path (same contract as [[ensureLshIndex]]).
    */
  def ensureIvfIndex(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    // v3: keyed past the r8 unified nearestCell assignment change — an index
    // trained by the old (core-count-dependent) clustering must not be
    // probed against the new inline path.
    val fix = s"/tmp/graft_fixtures/ivf_index_v3_${fingerprintCached(s"$dir/embeddings.parquet")}"
    if (!new java.io.File(s"$fix/centroids/_SUCCESS").exists())
      Similarity.writeIvfIndex(Tables.embeddings(s, dir), "vec_id", "embedding",
        nCells = 10, path = fix)
    fix
  }

  /** Ensure the write-time NEAR-DUP TEXT index for `dir`'s documents
    * exists; return its path (same contract as [[ensureLshIndex]]).
    */
  def ensureNearDupIndex(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val fix = s"/tmp/graft_fixtures/neardup_index_v2_${fingerprintCached(s"$dir/documents.parquet")}"
    if (!new java.io.File(s"$fix/_SUCCESS").exists())
      Dedup.writeNearDupIndex(Tables.documents(s, dir), "doc_id", "text",
        shingleK = 3, bands = 8, rowsPerBand = 2, nBuckets = 64, path = fix)
    fix
  }

  /** Build the write-time indexes up front (Bench warmup hook): index
    * construction is fixture prep, not the graded probe dataflow, and
    * leaving it inside the first timed rep made `llm_sim_topk_ivf_index`'s
    * min-of-2 reflect KMeans + write instead of the probe plan.
    */
  def prepareIndexes(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    ensureLshIndex(s, dir)
    ensureGrownLshIndex(s, dir)
    ensureIvfIndex(s, dir)
    ensureGrownIvfIndex(s, dir)
    ensureGrownIvfPqIndex(s, dir)
    ensureNearDupIndex(s, dir)
    ensureSimhashIndex(s, dir)
    ensureSimhashWideIndex(s, dir)
    ensureExactDupIndex(s, dir)
    ensureCompactedExactDupIndex(s, dir)
    ensureCompactedIvfPqIndex(s, dir)
    ensureRebuiltIvfPqIndex(s, dir)
    ensureImageHashWideIndex(s, dir)
    ensureVideoHashWideIndex(s, dir)
    ensureVideoStridedHashWideIndex(s, dir)
    ensureAudioHashWideIndex(s, dir)
    ensureLshIndexAuto(s, dir)
    ensureLshIndexMp(s, dir)
    ensurePairImageIndex(s, dir)
    ensurePairCaptionIndex(s, dir)
    ensureKnLm(s, dir)
    CurationQueries.ensureClfModel(s, dir)
    CurationQueries.ensureBpeTokenizer(s, dir)
  }

  /** Ensure the write-time SIMHASH index for `dir`'s documents exists;
    * return its path (same contract as [[ensureLshIndex]]).
    */
  def ensureSimhashIndex(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val fix = s"/tmp/graft_fixtures/simhash_index_v2_${fingerprintCached(s"$dir/documents.parquet")}"
    if (!new java.io.File(s"$fix/_SUCCESS").exists())
      Dedup.writeSimhashIndex(Tables.documents(s, dir), "doc_id", "text",
        maxHamming = 8, nBuckets = 32, path = fix)
    fix
  }

  /** Ensure the write-time WIDE-simhash index for `dir`'s documents
    * exists; return its path (same contract as [[ensureLshIndex]]).
    * nBuckets is AUTO-SIZED from the corpus cardinality
    * ([[Dedup.writeSimhashWideIndexAuto]]): a fixture-scale corpus gets
    * a narrow layout (the r10 fixed nBuckets=256 put 5,000 docs in
    * 2048 directories and the probe paid 3.4 s of per-file open cost),
    * while the same call widens toward the family's 32768-value band-key
    * headroom at corpus scale — the regime where the BASELINE.md
    * nBuckets sweep measured 7.5% of files touched at nb=4096.
    * Probes/appends resolve the chosen width from the params sidecar.
    */
  def ensureSimhashWideIndex(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val fix = s"/tmp/graft_fixtures/simhash_wide_index_v2_${fingerprintCached(s"$dir/documents.parquet")}"
    if (!new java.io.File(s"$fix/_SUCCESS").exists())
      Dedup.writeSimhashWideIndexAuto(Tables.documents(s, dir), "doc_id",
        "text", maxHamming = 7, path = fix)
    fix
  }

  /** Ensure the write-time EXACT-DUP index for `dir`'s documents exists;
    * return its path (same contract as [[ensureLshIndex]]).
    */
  def ensureExactDupIndex(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val fix = s"/tmp/graft_fixtures/exactdup_index_${fingerprintCached(s"$dir/documents.parquet")}"
    if (!new java.io.File(s"$fix/_SUCCESS").exists())
      Dedup.writeExactDupIndex(Tables.documents(s, dir), "doc_id", "text",
        nBuckets = 64, path = fix)
    fix
  }

  /** The mixed arriving batch of the composed-ingest e2e row: one
    * fixture class per pipeline stage, keyed by `doc_id % 11` and
    * id-shifted out of corpus range (distinct offsets per class, ≥50k
    * apart so no collisions at any SF). Texts derive from `documents`,
    * vectors from `embeddings` (doc_id == vec_id by construction);
    * "neg" vectors (novel direction — passes the semantic gate) carry
    * rows to the lexical stages, scaled vectors target it.
    */
  private def ingestE2eArriving(s: org.apache.spark.sql.SparkSession,
                                dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val base = docs
      .join(Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        col("doc_id") === col("vec_id"))
      .select("doc_id", "text", "embedding")
    val neg = transform(col("embedding"), x => -x).as("embedding")
    def sfx(tag: String) = concat(col("text"), lit(" " + tag),
      col("doc_id").cast("string"))
    def cls(r: Int) = base.filter(col("doc_id") % 11 === r)
    def half(t: org.apache.spark.sql.Column) =
      concat_ws(" ", slice(TextOps.tokens(t), lit(1),
        greatest(floor(size(TextOps.tokens(t)) / 2).cast("int"), lit(1))))
    // r5b: the NEXT doc's text under the base row's negated vector — a
    // semantic twin of r5a whose token bag shares nothing with it.
    val r5b = cls(5).join(
      docs.select((col("doc_id") - 1).as("doc_id"),
        col("text").as("next_text")), Seq("doc_id"))
    cls(0).select((col("doc_id") + 2000000L).as("doc_id"),
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
  }

  /** Full-replay DuckDB oracle of the composed ingest pipeline trace:
    * every stage recomputed in SQL from the base tables — the clf
    * weight table and KN-LM threshold retrained via the shared
    * MATERIALIZED CTE chains, wide-simhash membership via the lossless
    * 8-band join, LSH membership via the literal-weight projections.
    */
  private lazy val ingestE2eOracleSql: String = {
    val names = TextAnalysis.piiPatterns.map { case (n, _, _) => s"n_$n" }
    val redactSteps = TextAnalysis.piiPatterns.zipWithIndex.map {
      case ((name, pattern, replacement), i) =>
        s"""ps${i + 1} AS (SELECT doc_id, vv, ${
          (0 until i).map(j => s"n_${TextAnalysis.piiPatterns(j)._1}, ").mkString
        }CAST(len(regexp_extract_all(t, '$pattern')) AS BIGINT) AS n_$name,
           |  regexp_replace(t, '$pattern', '$replacement', 'g') AS t FROM ps$i)""".stripMargin
    }
    // Semantic stage buckets under the AUTO-SIZED layout: the shared
    // dynamic-plane CTEs (lshAutoCtes/lshAutoBucketsSql) replace the
    // static 4-plane unroll — same text at every SF, corpus-derived
    // plane VALUE.
    val pcb = lshAutoBucketsSql("pv", "vec_id", "v")
    val pab = lshAutoBucketsSql("pg4", "doc_id", "vv")
    val halfSql = "array_to_string(ws[1:greatest(len(ws)//2, 1)], ' ')"
    s"""${CurationQueries.clfCteSql},
       |norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
       |bgc AS (SELECT doc_id,
       |    unnest(list_transform(range(1, len(ws)),
       |      i -> ws[i] || ' ' || ws[i+1])) AS bg
       |  FROM norm),
       |bgw AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1,
       |    split_part(bg, ' ', 2) AS w2 FROM bgc),
       |c12 AS MATERIALIZED (SELECT bg, CAST(count(*) AS DOUBLE) AS c12
       |  FROM bgw GROUP BY 1),
       |c1s AS MATERIALIZED (SELECT w1, CAST(count(*) AS DOUBLE) AS c1,
       |    CAST(count(DISTINCT w2) AS DOUBLE) AS nfw FROM bgw GROUP BY 1),
       |cw AS MATERIALIZED (SELECT w2, CAST(count(DISTINCT w1) AS DOUBLE)
       |    AS ncw FROM bgw GROUP BY 1),
       |nb AS (SELECT CAST(count(*) AS DOUBLE) AS nbt FROM c12),
       |tu AS (SELECT CAST(floor(-ln(
       |      (greatest(c12 - 0.75, 0.0) + ((0.75 * nfw) * (ncw / nbt)))
       |        / c1) * 1e6 + 0.5) AS BIGINT) AS u
       |  FROM bgw JOIN c12 USING (bg) JOIN c1s USING (w1)
       |  JOIN cw USING (w2) CROSS JOIN nb),
       |thr AS (SELECT (CAST(sum(u) AS BIGINT) * 1000) // count(*) AS thr
       |  FROM tu),
       |${wideSigCte("documents", "pthc", "psimc")},
       |pbandc AS MATERIALIZED (${wideBandsSql("psimc")}),
       |pv AS (SELECT vec_id,
       |  list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |pbase AS (SELECT d.doc_id, d.text, ${toksSql("d.text")} AS ws, pv.v
       |  FROM documents d JOIN pv ON pv.vec_id = d.doc_id),
       |parr AS (
       |  SELECT doc_id + 2000000 AS doc_id,
       |    upper(' ' || regexp_replace(text, ' ', '   ', 'g') || '  ') AS t,
       |    list_transform(v, x -> -x) AS vv
       |  FROM pbase WHERE doc_id % 11 = 0
       |  UNION ALL
       |  SELECT doc_id + 2110000, text || ' zq' || doc_id,
       |    list_transform(v, x -> -x)
       |  FROM pbase WHERE doc_id % 11 = 1
       |  UNION ALL
       |  SELECT doc_id + 2160000, text || ' zq' || doc_id,
       |    list_transform(v, x -> -x)
       |  FROM pbase WHERE doc_id % 11 = 1
       |  UNION ALL
       |  SELECT doc_id + 2200000,
       |    array_to_string(list_reverse(string_split(text, ' ')), ' '),
       |    list_transform(v, x -> -x)
       |  FROM pbase WHERE doc_id % 11 = 2
       |  UNION ALL
       |  SELECT doc_id + 2310000, text || ' zr' || doc_id,
       |    list_transform(v, x -> -x)
       |  FROM pbase WHERE doc_id % 11 = 3
       |  UNION ALL
       |  SELECT doc_id + 2360000,
       |    array_to_string(list_reverse(
       |      string_split(text || ' zr' || doc_id, ' ')), ' '),
       |    list_transform(v, x -> -x)
       |  FROM pbase WHERE doc_id % 11 = 3
       |  UNION ALL
       |  SELECT doc_id + 2400000, text || ' zs' || doc_id,
       |    list_transform(v, x -> x * 2)
       |  FROM pbase WHERE doc_id % 11 = 4
       |  UNION ALL
       |  SELECT doc_id + 2510000, text || ' zt' || doc_id,
       |    list_transform(v, x -> -x)
       |  FROM pbase WHERE doc_id % 11 = 5
       |  UNION ALL
       |  SELECT d.doc_id + 2560000, n.text || ' zu' || d.doc_id,
       |    list_transform(d.v, x -> -x)
       |  FROM pbase d JOIN documents n ON n.doc_id = d.doc_id + 1
       |  WHERE d.doc_id % 11 = 5
       |  UNION ALL
       |  SELECT doc_id + 2600000, $halfSql,
       |    list_transform(v, x -> -x)
       |  FROM pbase WHERE doc_id % 11 = 6
       |  UNION ALL
       |  SELECT doc_id + 2700000,
       |    $halfSql || ' contact u' || doc_id || '@example.com',
       |    list_transform(v, x -> -x)
       |  FROM pbase WHERE doc_id % 11 = 7),
       |ps0 AS (SELECT doc_id, t, vv FROM parr),
       |${redactSteps.mkString(",\n")},
       |pg0 AS MATERIALIZED (SELECT doc_id, t, vv,
       |  ${names.mkString(" + ")} AS n_pii
       |  FROM ps${TextAnalysis.piiPatterns.size}),
       |px1 AS MATERIALIZED (SELECT g.doc_id FROM pg0 g
       |  WHERE EXISTS (SELECT 1 FROM documents c
       |    WHERE ${normSql("c.text")} = ${normSql("g.t")})),
       |pg1 AS MATERIALIZED (SELECT * FROM pg0
       |  WHERE doc_id NOT IN (SELECT doc_id FROM px1)),
       |px2 AS MATERIALIZED (SELECT doc_id FROM (
       |    SELECT doc_id, min(doc_id) OVER (PARTITION BY ${normSql("t")})
       |      AS mn FROM pg1)
       |  WHERE doc_id > mn),
       |pg2 AS MATERIALIZED (SELECT * FROM pg1
       |  WHERE doc_id NOT IN (SELECT doc_id FROM px2)),
       |pg2t AS (SELECT doc_id, t AS text FROM pg2),
       |${wideSigCte("pg2t", "ptha", "psima")},
       |pbanda AS MATERIALIZED (${wideBandsSql("psima")}),
       |px3 AS MATERIALIZED (SELECT DISTINCT a.doc_id
       |  FROM pbanda a JOIN pbandc c ON a.band = c.band AND a.key = c.key
       |  WHERE bit_count(xor(a.sh_lo, c.sh_lo))
       |    + bit_count(xor(a.sh_hi, c.sh_hi)) <= 7),
       |pg3 AS MATERIALIZED (SELECT * FROM pg2
       |  WHERE doc_id NOT IN (SELECT doc_id FROM px3)),
       |px4 AS MATERIALIZED (SELECT DISTINCT b.doc_id
       |  FROM pbanda a JOIN pbanda b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |  WHERE a.doc_id IN (SELECT doc_id FROM pg3)
       |    AND b.doc_id IN (SELECT doc_id FROM pg3)
       |    AND bit_count(xor(a.sh_lo, b.sh_lo))
       |      + bit_count(xor(a.sh_hi, b.sh_hi)) <= 7),
       |pg4 AS MATERIALIZED (SELECT * FROM pg3
       |  WHERE doc_id NOT IN (SELECT doc_id FROM px4)),
       |$lshAutoCtesMp,
       |pcb AS MATERIALIZED ($pcb),
       |pab AS MATERIALIZED ($pab),
       |pabm AS MATERIALIZED (${lshMultiProbeSql("pab", "doc_id", "vv")}),
       |px5 AS MATERIALIZED (SELECT DISTINCT ab.doc_id
       |  FROM pabm ab JOIN pcb cb
       |    ON ab.tbl = cb.tbl AND ab.bucket = cb.bucket
       |  WHERE ${cosSql("ab.vv", "cb.v")} >= 0.95),
       |pg5 AS MATERIALIZED (SELECT * FROM pg4
       |  WHERE doc_id NOT IN (SELECT doc_id FROM px5)),
       |px6 AS MATERIALIZED (SELECT DISTINCT b.doc_id
       |  FROM pabm a JOIN pab b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |  WHERE a.doc_id IN (SELECT doc_id FROM pg5)
       |    AND b.doc_id IN (SELECT doc_id FROM pg5)
       |    AND ${cosSql("a.vv", "b.vv")} >= 0.95),
       |pg6 AS MATERIALIZED (SELECT * FROM pg5
       |  WHERE doc_id NOT IN (SELECT doc_id FROM px6)),
       |pknb AS (SELECT doc_id,
       |    unnest(list_transform(range(1, len(ws)),
       |      i -> ws[i] || ' ' || ws[i+1])) AS bg
       |  FROM (SELECT doc_id, ${toksSql("t")} AS ws FROM pg6)),
       |pknw AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1,
       |    split_part(bg, ' ', 2) AS w2 FROM pknb),
       |pksc AS MATERIALIZED (SELECT doc_id,
       |    sum(CASE WHEN c12 IS NULL THEN 1 ELSE 0 END) AS n_unseen,
       |    sum(CASE WHEN c12 IS NOT NULL THEN CAST(floor(-ln(
       |      (greatest(c12 - 0.75, 0.0) + ((0.75 * nfw) * (ncw / nbt)))
       |        / c1) * 1e6 + 0.5) AS BIGINT) END) AS su,
       |    count(*) AS nb
       |  FROM pknw LEFT JOIN c12 USING (bg) LEFT JOIN c1s USING (w1)
       |  LEFT JOIN cw USING (w2) CROSS JOIN nb
       |  GROUP BY 1),
       |pkpass AS MATERIALIZED (SELECT pksc.doc_id FROM pksc CROSS JOIN thr
       |  WHERE n_unseen = 0 AND su * 1000 <= thr * nb),
       |px7 AS (SELECT doc_id FROM pg6
       |  WHERE doc_id NOT IN (SELECT doc_id FROM pkpass)),
       |pg7 AS MATERIALIZED (SELECT * FROM pg6
       |  WHERE doc_id IN (SELECT doc_id FROM pkpass)),
       |pcg0 AS (SELECT doc_id, unnest(list_concat(ws,
       |    list_transform(range(1, len(ws)),
       |      i -> ws[i] || ' ' || ws[i+1]))) AS g
       |  FROM (SELECT doc_id, ${toksSql("t")} AS ws FROM pg7)),
       |pcgb AS (SELECT DISTINCT doc_id, ${h60("g")} % 1024 AS b
       |  FROM pcg0 WHERE g <> ''),
       |pcfeat AS (SELECT doc_id, b FROM pcgb
       |  UNION ALL SELECT doc_id, CAST(-1 AS BIGINT) FROM pg7),
       |pcz AS (SELECT f.doc_id, CAST(COALESCE(sum(u), 0) AS BIGINT) AS z
       |  FROM pcfeat f LEFT JOIN w${CurationQueries.ClfIters} USING (b)
       |  GROUP BY f.doc_id),
       |pclfpass AS MATERIALIZED (SELECT doc_id FROM pcz WHERE z > 0),
       |px8 AS (SELECT doc_id FROM pg7
       |  WHERE doc_id NOT IN (SELECT doc_id FROM pclfpass)),
       |pg8 AS (SELECT doc_id FROM pg7
       |  WHERE doc_id IN (SELECT doc_id FROM pclfpass))
       |SELECT u.doc_id, u.rejected_by, g.n_pii
       |FROM (
       |  SELECT doc_id, 'exact' AS rejected_by FROM px1
       |  UNION ALL SELECT doc_id, 'exact_intra' FROM px2
       |  UNION ALL SELECT doc_id, 'near' FROM px3
       |  UNION ALL SELECT doc_id, 'near_intra' FROM px4
       |  UNION ALL SELECT doc_id, 'semantic' FROM px5
       |  UNION ALL SELECT doc_id, 'semantic_intra' FROM px6
       |  UNION ALL SELECT doc_id, 'kn' FROM px7
       |  UNION ALL SELECT doc_id, 'clf' FROM px8
       |  UNION ALL SELECT doc_id, 'accepted' FROM pg8
       |) u JOIN pg0 g USING (doc_id)""".stripMargin
  }

  /** The perturbed-delta probe batch the exact-dup maintenance queries
    * share: every 7th doc, whitespace-doubled and upper-cased, id-shifted
    * out of the corpus range.
    */
  private def compactProbeDelta(docs: org.apache.spark.sql.DataFrame) =
    docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        upper(concat(lit("  "), regexp_replace(col("text"), " ", "  "),
          lit(" "))).as("text"))

  /** Run the exact-dup index COMPACTION lifecycle once per content
    * fingerprint (build evens → append the odds in three delta batches →
    * pre-compaction probe → compact), persisting what the timed query
    * needs: the compacted layout at the returned path, the pre-compaction
    * probe pair set at `<path>_life/before_probe`, and the maintenance
    * contract counters at `<path>_life/meta`. Build/append/compact are
    * the WRITE-time maintenance steps of the layout — the graded
    * dataflow is the probe ([[prepareIndexes]] posture) — so Bench pays
    * them in warmup and `llm_index_compact`'s min-of-reps measures the
    * post-compaction probe plan, not fixture construction.
    */
  def ensureCompactedExactDupIndex(s: org.apache.spark.sql.SparkSession,
                                   dir: String): String = {
    val fix = s"/tmp/graft_fixtures/compact_exactdup_${fingerprintCached(s"$dir/documents.parquet")}"
    if (!new java.io.File(s"${fix}_life/_DONE").exists()) {
      val docs = Tables.documents(s, dir)
      Dedup.writeExactDupIndex(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", nBuckets = 16, path = fix)
      // Odd ids in three delta batches (1, 3, 5 mod 6 = the odds), so
      // the layout ends fragmented AND complete: every corpus doc has
      // exactly one signature row.
      Seq(1L, 3L, 5L).foreach { r =>
        Dedup.appendToExactDupIndex(docs.filter(col("doc_id") % 6 === r),
          "doc_id", "text", nBuckets = 16, path = fix)
      }
      // The parquet write is an eager action, so the pre-compaction pair
      // set is fully materialized before compactIndex renames the files
      // it reads.
      Dedup.probeExactDupIndex(s, fix, compactProbeDelta(docs),
          "doc_id", "text", nBuckets = 16)
        .write.mode("overwrite").parquet(s"${fix}_life/before_probe")
      val nDocs = docs.count()
      val (filesBefore, filesAfter, rowsAfter) = Dedup.compactIndex(s, fix)
      import s.implicits._
      Seq((filesBefore, filesAfter, rowsAfter, nDocs))
        .toDF("files_before", "files_after", "rows_after", "n_docs")
        .write.mode("overwrite").parquet(s"${fix}_life/meta")
      new java.io.File(s"${fix}_life/_DONE").createNewFile()
    }
    fix
  }

  /** IVF-PQ COMPACTION lifecycle, memoized like
    * [[ensureCompactedExactDupIndex]]: build the evens, append the odds
    * in three delta batches, persist the pre-compaction ANN probe and
    * the contract counters, compact. The corpus and training set match
    * [[ensureGrownIvfPqIndex]]'s.
    */
  def ensureCompactedIvfPqIndex(s: org.apache.spark.sql.SparkSession,
                                dir: String): String = {
    val fix = s"/tmp/graft_fixtures/compact_ivfpq_${fingerprintCached(s"$dir/embeddings.parquet")}"
    if (!new java.io.File(s"${fix}_life/_DONE").exists()) {
      val emb = Tables.embeddings(s, dir)
      Similarity.writeIvfPqIndex(emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", nCells = 10, m = 8, codebookK = 32, path = fix)
      Seq(1L, 3L, 5L).foreach { r =>
        Similarity.appendToIvfPqIndex(s,
          emb.filter(col("vec_id") % 6 === r), "vec_id", "embedding", fix)
      }
      Similarity.ivfPqTopKFromIndex(s, fix, emb,
          "vec_id", "embedding", col("vec_id") < 10,
          k = 5, nProbe = 5, oversample = 8)
        .select(col("query_id"), col("cand_id"))
        .write.mode("overwrite").parquet(s"${fix}_life/before_probe")
      val nVecs = emb.count()
      val (filesBefore, filesAfter, rowsAfter) =
        Similarity.compactIvfPqIndex(s, fix)
      import s.implicits._
      Seq((filesBefore, filesAfter, rowsAfter, nVecs))
        .toDF("files_before", "files_after", "rows_after", "n_docs")
        .write.mode("overwrite").parquet(s"${fix}_life/meta")
      new java.io.File(s"${fix}_life/_DONE").createNewFile()
    }
    fix
  }

  /** IVF-PQ whole-index RETRAIN lifecycle, memoized: train on the evens,
    * grow with the odds against the frozen artifacts (the documented
    * drift posture), rebuild both quantizers on the full corpus with an
    * atomic swap, and build the from-scratch reference index. Returns
    * (rebuilt path, fresh-reference path); training is deterministic, so
    * the memoized layouts are bit-identical to an in-query rerun.
    */
  def ensureRebuiltIvfPqIndex(s: org.apache.spark.sql.SparkSession,
                              dir: String): (String, String) = {
    val fix = s"/tmp/graft_fixtures/rebuild_ivfpq_${fingerprintCached(s"$dir/embeddings.parquet")}"
    val ref = s"${fix}_FRESH"
    if (!new java.io.File(s"${fix}_life/_DONE").exists()) {
      val emb = Tables.embeddings(s, dir)
      Similarity.writeIvfPqIndex(emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", nCells = 10, m = 8, codebookK = 32, path = fix)
      Similarity.appendToIvfPqIndex(s, emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", fix)
      Similarity.rebuildIvfPqIndex(emb, "vec_id", "embedding",
        nCells = 10, m = 8, codebookK = 32, indexPath = fix)
      Similarity.writeIvfPqIndex(emb, "vec_id", "embedding",
        nCells = 10, m = 8, codebookK = 32, path = ref)
      new java.io.File(s"${fix}_life").mkdirs()
      new java.io.File(s"${fix}_life/_DONE").createNewFile()
    }
    (fix, ref)
  }

  /** Ensure the write-time WIDE IMAGE perceptual index for `dir`'s
    * synthetic image corpus exists; return its path (same contract as
    * [[ensureLshIndex]]). The generic WIDE hamming family
    * ([[Dedup.writeHammingWideIndex]]) over the 110-bit two-word
    * dHashes — the ingest-path layout whose 13–14-bit band keys keep
    * DPP pruning at corpus scale (the retired narrow 56-bit layout's
    * 7-bit keys were measured exactly quadratic; BASELINE.md
    * round-15). Build decodes every image ONCE at write time; probes
    * never touch corpus pixels again.
    */
  def ensureImageHashWideIndex(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    implicit val sp: org.apache.spark.sql.SparkSession = s
    // AUTO bucket width (round-18, the audio family's round-17 fix
    // extended): nBuckets from the corpus cardinality via the wide-auto
    // writer — rowsHint is the cheap parquet count (one signature row
    // per image), so the pixel decode still runs exactly once. A fixed
    // 64 saturates DPP/static pruning at corpus scale (measured on the
    // audio layout: 75% of files touched by a 50-item probe at sf10 vs
    // 13.5% auto). Consumers resolve the width from the sidecar
    // (Dedup.hammingWideIndexBuckets); the cache key carries the
    // policy tag so a stale fixed-64 layout is never half-adopted.
    val fix = s"/tmp/graft_fixtures/imagehashw_index_auto_${fingerprintCached(s"$dir/documents.parquet")}"
    if (!new java.io.File(s"$fix/_SUCCESS").exists()) {
      val docs = Tables.documents(s, dir)
      Dedup.writeHammingWideIndexAuto(
        Multimodal.extractImageHashesWide(
          Multimodal.syntheticImageGroups(docs, "doc_id")).toDF(),
        "media_id", "dhash", "vhash", nLoBits = 56, nHiBits = 54,
        maxHamming = 7, path = fix, rowsHint = docs.count())
    }
    fix
  }

  /** Ensure the PAIR-CORPUS image index for the cross-modal pair gate:
    * the wide image-hash layout over the PAIR corpus — every 4th
    * document, so each corpus pair's image is the single member of its
    * pixel group ([[Multimodal.syntheticImageGroups]] groups
    * consecutive ids in fours) and the designed gate decisions are
    * about the ARRIVING pair, not corpus-internal group mates. Same
    * auto-width generic layout as [[ensureImageHashWideIndex]].
    */
  def ensurePairImageIndex(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val fix = s"/tmp/graft_fixtures/pairimg_index_auto_${fingerprintCached(s"$dir/documents.parquet")}"
    if (!new java.io.File(s"$fix/_SUCCESS").exists()) {
      val corp = Tables.documents(s, dir).filter(col("doc_id") % 4 === 0)
      Dedup.writeHammingWideIndexAuto(
        Multimodal.extractImageHashesWide(
          Multimodal.syntheticImageGroups(corp, "doc_id")).toDF(),
        "media_id", "dhash", "vhash", nLoBits = 56, nHiBits = 54,
        maxHamming = 7, path = fix, rowsHint = corp.count())
    }
    fix
  }

  /** The caption side of the pair corpus: the auto-width wide-simhash
    * text index over the SAME every-4th-document subset — pair i =
    * (image of doc i, caption = doc i's text), one id domain for both
    * indexes so the gate's per-(query, cand) anti-join needs no key
    * mapping.
    */
  def ensurePairCaptionIndex(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val fix = s"/tmp/graft_fixtures/paircap_index_auto_${fingerprintCached(s"$dir/documents.parquet")}"
    if (!new java.io.File(s"$fix/_SUCCESS").exists())
      Dedup.writeSimhashWideIndexAuto(
        Tables.documents(s, dir).filter(col("doc_id") % 4 === 0),
        "doc_id", "text", maxHamming = 7, path = fix)
    fix
  }

  /** Ensure the write-time WIDE VIDEO first-frame index for `dir`'s
    * synthetic video corpus exists; return its path
    * ([[ensureImageHashWideIndex]]'s video twin — build decodes every
    * corpus frame ONCE at write time; probes never touch corpus pixels
    * again).
    */
  def ensureVideoHashWideIndex(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    implicit val sp: org.apache.spark.sql.SparkSession = s
    // AUTO width like the image/audio families (round-18) — one
    // first-frame signature row per video, so rowsHint is the corpus
    // count and the frame decode stays single-pass.
    val fix = s"/tmp/graft_fixtures/videohashw_index_auto_${fingerprintCached(s"$dir/documents.parquet")}"
    if (!new java.io.File(s"$fix/_SUCCESS").exists()) {
      val docs = Tables.documents(s, dir)
      Dedup.writeHammingWideIndexAuto(
        Multimodal.extractVideoFrameHashesWide(
          Multimodal.syntheticVideoGroups(docs, "doc_id")).toDF(),
        "media_id", "dhash", "vhash", nLoBits = 56, nHiBits = 54,
        maxHamming = 7, path = fix, rowsHint = docs.count())
    }
    fix
  }

  /** Ensure the write-time WIDE STRIDED video index for `dir`'s
    * scrambled-first-frame video corpus exists; return its path. The
    * same wide hamming family as [[ensureVideoHashWideIndex]], but the
    * layout stores one row per (video, strided frame) — the signature
    * SET — so probes via [[Dedup.probeHammingWideIndexSet]] match on
    * ANY shared frame, closing the first-frame re-encode evasion on
    * the corpus-scale index path.
    */
  def ensureVideoStridedHashWideIndex(s: org.apache.spark.sql.SparkSession,
                                      dir: String): String = {
    implicit val sp: org.apache.spark.sql.SparkSession = s
    // AUTO width (round-18). The strided layout stores k=3 signature
    // rows per video, and autoBuckets sizes by SIGNATURE-ROW
    // cardinality (bucket width is what probes pay per directory), so
    // rowsHint is 3× the corpus count — still a metadata-only derivation,
    // the AVI decode stays single-pass.
    val fix = s"/tmp/graft_fixtures/videostridedw_index_auto_${fingerprintCached(s"$dir/documents.parquet")}"
    if (!new java.io.File(s"$fix/_SUCCESS").exists()) {
      val docs = Tables.documents(s, dir)
      Dedup.writeHammingWideIndexAuto(
        Multimodal.extractVideoFrameHashesStridedWide(
          Multimodal.syntheticVideoGroupsStrided(docs, "doc_id"),
          k = 3).toDF(),
        "media_id", "dhash", "vhash", nLoBits = 56, nHiBits = 54,
        maxHamming = 7, path = fix, rowsHint = 3L * docs.count())
    }
    fix
  }

  /** Ensure the AUTO-SIZED LSH hyperplane index over `dir`'s
    * embeddings exists; return its path. Width-targeted planes
    * ([[Similarity.lshPlanesAuto]], 256/bucket) — the scale posture
    * the fixed-4-plane layout lacks: at sf10 the 4-plane semantic
    * gate's corpus-sized probe measured 460 s (bucket width grows
    * linearly with the corpus on 16 buckets), vs ~width-bounded cost
    * here. Tables are RECALL-COMPENSATED ([[Similarity.lshTablesAuto]],
    * round-17): fixed t=4 under auto-grown planes decays threshold
    * recall toward ~0.55 at the p=16 clamp. Callers resolve BOTH layout
    * params from the sidecar ([[Similarity.lshIndexPlanes]] /
    * [[Similarity.lshIndexTables]]), never by re-deriving. The cache
    * key carries the layout params (w256/r95) alongside the corpus
    * fingerprint, so a layout-policy change can never serve a stale
    * index built under older defaults to a query whose oracle derives
    * the new ones.
    */
  def ensureLshIndexAuto(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val fix = s"/tmp/graft_fixtures/lshauto_index_w256r95_${fingerprintCached(s"$dir/embeddings.parquet")}"
    if (!new java.io.File(s"$fix/_SUCCESS").exists())
      Similarity.writeLshIndexAuto(Tables.embeddings(s, dir), "vec_id",
        "embedding", path = fix)
    fix
  }

  /** Ensure the MULTI-PROBE-POSTURE LSH layout over `dir`'s embeddings
    * exists; return its path. Auto-sized planes like
    * [[ensureLshIndexAuto]], but a FIXED
    * [[Similarity.MultiProbeTables]]-table layout (index storage ×1)
    * probed with the Hamming-1 expansion — the round-18 posture of the
    * streaming SEMANTIC GATE and the composed ingest pipeline: the
    * gate's membership index grows with the corpus (every accepted row
    * appends its bucket rows), so at 100 TB write amplification — not
    * the batch-sized probe width — is the binding cost, and the
    * measured recall contract (`llm_lsh_multiprobe_recall`:
    * 1.0/1.0/0.9955 across sf0.1/1/10, FASTER than exact-bucket at
    * sf1/sf10) holds from 4 tables. The compensated t(p)-table layout
    * ([[ensureLshIndexAuto]]) remains the posture for probe-heavy
    * BATCH analytics where the layout is built once and probe latency
    * dominates. Tables are independent hash functions keyed by the
    * global plane index, so this layout's buckets are bit-identical
    * to the first 4 tables of the compensated layout — the recall
    * contract's 4-table-prefix measurements transfer exactly.
    */
  def ensureLshIndexMp(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val fix = s"/tmp/graft_fixtures/lshmp_index_w256t4_${fingerprintCached(s"$dir/embeddings.parquet")}"
    if (!new java.io.File(s"$fix/_SUCCESS").exists())
      Similarity.writeLshIndexAuto(Tables.embeddings(s, dir), "vec_id",
        "embedding", path = fix, numTables = Similarity.MultiProbeTables)
    fix
  }

  /** Ensure the write-time WIDE AUDIO fingerprint index for `dir`'s
    * synthetic audio corpus exists; return its path
    * ([[ensureImageHashWideIndex]]'s audio twin — build decodes every
    * corpus WAV ONCE at write time; probes never touch corpus samples
    * again). Same generic (56, 54, 7) wide hamming layout as the
    * image family: the two modalities share banding arithmetic, DPP
    * pruning, and compaction machinery end to end.
    */
  def ensureAudioHashWideIndex(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    implicit val sp: org.apache.spark.sql.SparkSession = s
    // AUTO bucket width (round-17): nBuckets from the corpus
    // cardinality (BandedIndex.autoBuckets via the wide-auto writer —
    // rowsHint is the cheap parquet count, so the WAV decode still
    // runs exactly once), recorded in the sidecar; consumers resolve
    // it back (Dedup.hammingWideIndexBuckets) instead of assuming 64.
    // A fixed 64 saturates DPP pruning at corpus scale — the same
    // measured effect the text family's auto sizing fixed in round 12.
    // The cache key carries the policy tag so an old fixed-64 cached
    // layout is never half-adopted.
    val fix = s"/tmp/graft_fixtures/audiohashw_index_auto_${fingerprintCached(s"$dir/documents.parquet")}"
    if (!new java.io.File(s"$fix/_SUCCESS").exists()) {
      val docs = Tables.documents(s, dir)
      Dedup.writeHammingWideIndexAuto(
        Multimodal.extractAudioHashesWide(
          Multimodal.syntheticAudioGroups(docs, "doc_id")).toDF(),
        "media_id", "ehash", "rhash", nLoBits = 56, nHiBits = 54,
        maxHamming = 7, path = fix, rowsHint = docs.count())
    }
    fix
  }

  // ---- DuckDB SQL fragment generators (mirror graft.llm.TextOps) ----

  /** normalize(text) */
  private def normSql(c: String) =
    s"regexp_replace(lower(trim($c)), '\\s+', ' ', 'g')"

  /** whitespace tokens of normalized text */
  private def toksSql(c: String) = s"string_split(${normSql(c)}, ' ')"

  /** 60-bit md5 hash of a string expression */
  private def h60(e: String) =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** distinct word 3-shingles of `ws` (a token-list expression) */
  private def shinglesSql(ws: String) =
    s"""list_distinct(CASE WHEN len($ws) - 2 >= 1
       |  THEN list_transform(range(1, len($ws) - 1),
       |         i -> array_to_string(($ws)[i:i+2], ' '))
       |  ELSE [array_to_string($ws, ' ')] END)""".stripMargin

  /** sequential double fold: sum of the list `l` left-to-right from 0.0 */
  private def foldSum(l: String) =
    s"list_reduce(list_prepend(0.0::DOUBLE, $l), (acc, x) -> acc + x)"

  /** elementwise-product dot fold of double-list expressions a, b */
  private def dotSql(a: String, b: String) =
    foldSum(s"list_transform(range(1, len($a) + 1), i -> ($a)[i] * ($b)[i])")

  /** cosine in the pinned shape: dot / (sqrt(na) * sqrt(nb)) */
  private def cosSql(a: String, b: String) =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** The llm_lsh_recall_auto rotation, as STRING literals so the Spark
    * side (`lit(LshRotCos.toDouble)`) and the SQL twin (spliced text)
    * parse the IDENTICAL decimal — the (7,24,25)/25 exact pair:
    * cos² + sin² = 0.9216 + 0.0784 = 1, so the pairwise plane rotation
    * is an isometry and every planted pair's cosine is 0.96 by
    * construction (float-safe margins to both the 0.95 gate band and
    * the 0.9 truth threshold).
    */
  private val LshRotCos = "0.96"
  private val LshRotSin = "0.28"

  /** deterministic hyperplane projection of double-list v onto plane p:
    * the same plan-time literal weights as Similarity.planeWeight
    */
  private def projSql(v: String, p: Int) = {
    val w = (0 until 64).map(i => Similarity.planeWeight(p, i)).mkString(", ")
    foldSum(s"list_transform(range(1, len($v) + 1), i -> ($v)[i] * ([$w]::DOUBLE[])[i])")
  }

  /** DuckDB twin of the AUTO-SIZED LSH layout
    * ([[Similarity.lshPlanesAuto]] at targetWidth 256 over
    * `count(embeddings)` + the md5 `planeWeight` formula): `lpl(pl)`
    * is the corpus-derived plane count (integer bit-length arithmetic,
    * no float log), `ltb(tb)` the RECALL-COMPENSATED table count
    * (spliced from [[Similarity.lshTablesByPlanes]] — the round-17
    * fix for fixed-4-table recall decay), `lpw(idx, wl)` the weight
    * list of every global plane index `table·pl + p` — at most
    * 15·16 = 240 rows of 64 weights, so the dynamic-index replay
    * costs a tiny CTE instead of per-row hashing. Both layout params
    * are VALUES in the static SQL text, which is what lets one oracle
    * string hold at every SF while the layout scales with the corpus.
    */
  private def lshAutoCtesWith(tbBody: String): String =
    s"""lpl AS (SELECT least(16, greatest(4,
      |    CASE WHEN m <= 1 THEN 0 ELSE len(bin(m - 1)) END)) AS pl
      |  FROM (SELECT ((SELECT count(*) FROM embeddings) + 255) // 256 AS m)),
      |ltb AS (SELECT $tbBody AS tb),
      |lpw AS (SELECT idx, list(wt ORDER BY i) AS wl FROM (
      |    SELECT ti.idx, ii.i,
      |      CAST(CAST('0x' || substr(md5('plane' || ti.idx || ':' || ii.i),
      |          1, 15) AS BIGINT) % 2001 - 1000 AS DOUBLE) AS wt
      |    FROM (SELECT unnest(range(0, (SELECT tb FROM ltb)
      |        * (SELECT pl FROM lpl))) AS idx) ti,
      |         (SELECT unnest(range(0, 64)) AS i) ii)
      |  GROUP BY idx)""".stripMargin

  private lazy val lshAutoCtes: String = {
    // Planes→tables spliced from the ONE Scala lookup
    // (Similarity.lshTablesByPlanes) — hard-coded integers, so no
    // float-log replay and no drift between the layout builder and
    // this twin.
    val tbCase = (4 to 16)
      .map(p => s"WHEN $p THEN ${Similarity.lshTablesAuto(p)}")
      .mkString(" ")
    lshAutoCtesWith(s"CASE (SELECT pl FROM lpl) $tbCase END")
  }

  /** [[lshAutoCtes]] for the MULTI-PROBE-POSTURE layout
    * ([[ensureLshIndexMp]]): auto planes, a FIXED
    * [[Similarity.MultiProbeTables]]-table layout — `tb` is the
    * literal table count instead of the compensated lookup.
    */
  private lazy val lshAutoCtesMp: String =
    lshAutoCtesWith(Similarity.MultiProbeTables.toString)

  /** The Hamming-1 MULTI-PROBE bucket expansion of a bucket-assignment
    * CTE `src`(idCol, vCol, tbl, bucket): one row per probe variant —
    * j = 0 the exact bucket, j = 1..pl one plane-bit flip each — the
    * SQL twin of [[Similarity.probeLshThresholdMultiProbe]]'s probe
    * set.
    */
  private def lshMultiProbeSql(src: String, idCol: String,
                               vCol: String): String =
    s"""SELECT $idCol, $vCol, tbl,
       |  CASE WHEN j = 0 THEN bucket
       |    ELSE xor(bucket, (CAST(1 AS BIGINT) << (j - 1))) END AS bucket
       |FROM $src, (SELECT unnest(range(0,
       |    (SELECT pl FROM lpl) + 1)) AS j) jj""".stripMargin

  /** All-tables bucket assignment of `src`(idCol, vCol) under the
    * auto-sized layout ([[lshAutoCtes]] must be in scope): emits
    * `SELECT idCol, vCol, tbl, bucket` — the dynamic-plane twin of the
    * static `projSql`-unrolled bucket unions.
    */
  private def lshAutoBucketsSql(src: String, idCol: String,
                                vCol: String): String =
    s"""SELECT $idCol, $vCol, tbl,
       |  CAST(sum(CASE WHEN proj >= 0
       |    THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END)
       |    AS BIGINT) AS bucket
       |FROM (
       |  SELECT s.$idCol, s.$vCol, tt.tbl, pp.p,
       |    ${foldSum(s"list_transform(range(1, len(s.$vCol) + 1), " +
                      s"i -> (s.$vCol)[i] * (w.wl)[i])")} AS proj
       |  FROM $src s,
       |       (SELECT unnest(range(0, (SELECT tb FROM ltb))) AS tbl) tt,
       |       (SELECT unnest(range(0, (SELECT pl FROM lpl))) AS p) pp,
       |       lpw w
       |  WHERE w.idx = tt.tbl * (SELECT pl FROM lpl) + pp.p)
       |GROUP BY 1, 2, 3""".stripMargin

  /** The shared RECALL-CONTRACT dataflow of the two LSH recall rows
    * (`llm_lsh_recall_auto` / `llm_lsh_multiprobe_recall`): rotate
    * every 3rd corpus vector by exactly acos(0.96) (the (7,24,25)/25
    * isometry — see [[LshRotCos]]), take the brute-force cosine scan
    * at 0.9 as ground truth, join the given probe path's hits, and
    * aggregate recall at the 0.95 gate band. The two rows differ ONLY
    * in `probe` — exact-bucket over the recall-compensated table count
    * vs Hamming-1 multi-probe over a fixed 4-table prefix — so their
    * recall numbers are directly comparable decade by decade.
    */
  private def lshRecallContract(s: org.apache.spark.sql.SparkSession,
      dir: String,
      probe: (String, Int, Int, org.apache.spark.sql.DataFrame) =>
        org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val fix = ensureLshIndexAuto(s, dir)
    val planes = Similarity.lshIndexPlanes(s, fix)
    val tables = Similarity.lshIndexTables(s, fix)
    val emb = Tables.embeddings(s, dir)
    val rc = lit(LshRotCos.toDouble)
    val rs = lit(LshRotSin.toDouble)
    val arriving = emb
      .filter(col("vec_id") % 3 === 1 && col("vec_id") < 20000L)
      .select((col("vec_id") + 50000L).as("vec_id"),
        col("embedding"))
      .withColumn("vd", transform(col("embedding"), x => x.cast("double")))
      .withColumn("embedding", transform(col("vd"), (x, i) =>
        when(i % 2 === 0,
          x * rc - element_at(col("vd"), i + lit(2)) * rs)
        .otherwise(
          element_at(col("vd"), i) * rs + x * rc)))
      .select("vec_id", "embedding")
    val truth = Similarity.rangeSearch(emb, arriving,
      "vec_id", "embedding", minCos = 0.9)
    val hits = probe(fix, planes, tables, arriving)
      .select(col("query_id"), col("cand_id"), lit(1).as("hit"))
    val gate = col("cos") >= 0.95
    truth.join(hits, Seq("query_id", "cand_id"), "left")
      .select(col("cos"), coalesce(col("hit"), lit(0)).as("hit"))
      .agg(
        count(lit(1)).as("n_truth"),
        sum(col("hit")).cast("long").as("n_hit"),
        sum(when(gate, 1).otherwise(0)).cast("long").as("n_truth_gate"),
        sum(when(gate, col("hit")).otherwise(0)).cast("long")
          .as("n_hit_gate"))
      .withColumn("recall_gate",
        col("n_hit_gate").cast("double") / col("n_truth_gate").cast("double"))
      .withColumn("recall_ok", (col("recall_gate") >= 0.9).cast("int"))
  }

  /** DuckDB twin of [[lshRecallContract]], parameterized by the `hits`
    * CTE body (which sees `cb`/`ab` — corpus/query bucket assignments
    * under the auto layout — in scope). One SQL skeleton for both
    * recall rows; only the probe expansion differs.
    */
  private def lshRecallOracleSql(hitsCte: String): String =
    s"""$vecCte,
       |$lshAutoCtes,
       |qr AS (SELECT vec_id + 50000 AS vec_id,
       |    list_transform(range(1, len(v) + 1), i ->
       |      CASE WHEN i % 2 = 1
       |        THEN v[i] * $LshRotCos - v[i + 1] * $LshRotSin
       |        ELSE v[i - 1] * $LshRotSin + v[i] * $LshRotCos END) AS v
       |  FROM v WHERE vec_id % 3 = 1 AND vec_id < 20000),
       |truth AS (SELECT * FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |      ${cosSql("q.v", "c.v")} AS cos
       |    FROM v c CROSS JOIN qr q)
       |  WHERE cos >= 0.9),
       |cb AS (${lshAutoBucketsSql("v", "vec_id", "v")}),
       |ab AS (${lshAutoBucketsSql("qr", "vec_id", "v")}),
       |$hitsCte,
       |j AS (SELECT t.cos,
       |    CASE WHEN h.query_id IS NULL THEN 0 ELSE 1 END AS hit
       |  FROM truth t LEFT JOIN hits h
       |    ON t.query_id = h.query_id AND t.cand_id = h.cand_id),
       |agg AS (SELECT
       |    CAST(count(*) AS BIGINT) AS n_truth,
       |    CAST(sum(hit) AS BIGINT) AS n_hit,
       |    CAST(sum(CASE WHEN cos >= 0.95 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_truth_gate,
       |    CAST(sum(CASE WHEN cos >= 0.95 THEN hit ELSE 0 END) AS BIGINT)
       |      AS n_hit_gate
       |  FROM j)
       |SELECT n_truth, n_hit, n_truth_gate, n_hit_gate,
       |  CAST(n_hit_gate AS DOUBLE) / CAST(n_truth_gate AS DOUBLE)
       |    AS recall_gate,
       |  CAST(CAST(n_hit_gate AS DOUBLE) / CAST(n_truth_gate AS DOUBLE)
       |    >= 0.9 AS INT) AS recall_ok
       |FROM agg""".stripMargin

  /** Spark side of the quality score: signals + the combined [0,1]
    * score, shared by llm_quality and llm_quality_sample so both rows
    * are guaranteed the same projection.
    */
  private def qualityScored(s: org.apache.spark.sql.SparkSession,
                            dir: String): org.apache.spark.sql.DataFrame = {
    val sig = TextAnalysis.qualitySignals(
      Tables.documents(s, dir), "doc_id", "text")
    sig.withColumn("quality",
      (least(col("chars_per_token") / lit(8.0), lit(1.0)) +
        least(col("punct_ratio") * lit(20.0), lit(1.0)) +
        least(col("stopword_ratio") * lit(5.0), lit(1.0))) / lit(3.0))
  }

  /** DuckDB twin of [[TextAnalysis.qualitySignals]] (the `sig` CTE body). */
  private lazy val qualitySigSql: String = {
    val stop = TextAnalysis.langProfiles.flatMap(_._2).distinct
      .map(m => s"'$m'").mkString("[", ", ", "]")
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(len(${toksSql("text")}) AS BIGINT) AS n_tokens,
       |  length(text)::DOUBLE / len(${toksSql("text")})::DOUBLE AS chars_per_token,
       |  len(list_filter(${toksSql("text")}, x -> length(x) > 3))::DOUBLE /
       |    len(${toksSql("text")})::DOUBLE AS long_token_ratio,
       |  len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE /
       |    length(text)::DOUBLE AS punct_ratio,
       |  len(list_filter(${toksSql("text")}, x -> list_contains($stop, x)))::DOUBLE /
       |    len(${toksSql("text")})::DOUBLE AS stopword_ratio
       |FROM documents""".stripMargin
  }

  /** DuckDB twin of the combined quality score over `sig` columns. */
  private val qualityExprSql: String =
    """(least(chars_per_token / 8.0, 1.0) + least(punct_ratio * 20.0, 1.0) +
      | least(stopword_ratio * 5.0, 1.0)) / 3.0""".stripMargin

  /** MinHash-LSH near-dup clusters as a reusable CTE chain ending in
    * `cl(doc_id, cluster_id)` — the connected-components twin of
    * [[graft.llm.Dedup.dedupClusters]] over minhashLshPairs (recursive
    * closure; same signature params as llm_dedup_minhash_lsh).
    */
  private lazy val clustersCteSql: String = {
    val P = TextOps.MinhashP
    val mins = (0 until 16).map { i =>
      val (a, b) = TextOps.minhashParams(i)
      s"list_min(list_transform(hs, h -> ($a * h + $b) % $P))"
    }.mkString("[", ", ", "]")
    s"""WITH RECURSIVE norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
       |sh AS (SELECT doc_id, ${shinglesSql("ws")} AS sh FROM norm),
       |hs AS (SELECT doc_id, sh,
       |  list_transform(sh, s -> ${h60("s")} % $P) AS hs FROM sh),
       |sig AS (SELECT doc_id, sh, $mins AS sig FROM hs),
       |banded AS (SELECT doc_id, sh, b.band,
       |  array_to_string(sig[b.band*2+1:b.band*2+2], '_') AS bkey
       |  FROM sig, (SELECT unnest(range(0, 8)) AS band) b),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  a.sh AS sa, b.sh AS sb
       |  FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |pairs AS (SELECT id_a, id_b FROM cand
       |  WHERE len(list_intersect(sa, sb))::DOUBLE /
       |    (len(sa) + len(sb) - len(list_intersect(sa, sb)))::DOUBLE >= 0.5),
       |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |reach AS (SELECT s, d FROM edges
       |  UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
       |cl AS (SELECT s AS doc_id, least(s, min(d)) AS cluster_id
       |  FROM reach GROUP BY s)""".stripMargin
  }

  /** DuckDB twin of [[graft.llm.Dedup.simhashFrame]] ending in
    * `sim(doc_id, simhash)` — shared by the signature, inline-pairs,
    * and index-probe rows.
    */
  private lazy val simhashCte: String =
    s"""WITH th AS (SELECT doc_id, list_transform(${toksSql("text")},
       |  t -> ${h60("t")}) AS th FROM documents),
       |sim AS (SELECT doc_id, list_reduce(list_transform(range(0, 60), j ->
       |  CASE WHEN list_reduce(list_prepend(0::BIGINT, list_transform(th,
       |    h -> CASE WHEN (h >> j) & 1 = 1 THEN 1::BIGINT ELSE (-1)::BIGINT END)),
       |    (a, b) -> a + b) >= 0
       |  THEN (1::BIGINT << j) ELSE 0::BIGINT END), (a, b) -> a | b) AS simhash
       |FROM th)""".stripMargin

  /** DuckDB twin of [[graft.llm.Dedup.simhashWideFrame]] ending in
    * `simw(doc_id, sh_lo, sh_hi)`: the lo word votes with h60(token),
    * the hi word with the salt-1 hash `h60('1:' || token)` — shared by
    * the wide-pairs and wide-index-probe rows.
    */
  private def wideFoldSql(th: String) =
    s"""list_reduce(list_transform(range(0, 60), j ->
       |  CASE WHEN list_reduce(list_prepend(0::BIGINT, list_transform($th,
       |    h -> CASE WHEN (h >> j) & 1 = 1 THEN 1::BIGINT ELSE (-1)::BIGINT END)),
       |    (a, b) -> a + b) >= 0
       |  THEN (1::BIGINT << j) ELSE 0::BIGINT END), (a, b) -> a | b)""".stripMargin

  /** The (th, sim) CTE pair computing wide signatures of `src`'s
    * (doc_id, text) rows — parameterized by CTE names so a second
    * source (the gate's arriving batch) can carry its own.
    */
  private def wideSigCte(src: String, th: String, sim: String): String =
    s"""$th AS (SELECT doc_id,
       |  list_transform(${toksSql("text")}, t -> ${h60("t")}) AS t1,
       |  list_transform(${toksSql("text")}, t -> ${h60("'1:' || t")}) AS t2
       |FROM $src),
       |$sim AS (SELECT doc_id, ${wideFoldSql("t1")} AS sh_lo,
       |  ${wideFoldSql("t2")} AS sh_hi
       |FROM $th)""".stripMargin

  /** The maxHamming=7 WIDE band slices over a sig CTE — 4 x 15-bit
    * slices of each word, bands 0-3 from sh_lo, 4-7 from sh_hi (the
    * [[graft.llm.Dedup]] hammingBandsWide split).
    */
  private def wideBandsSql(sim: String): String = {
    val lo = (0 until 4).map(b =>
      s"SELECT doc_id, sh_lo, sh_hi, $b AS band, ((sh_lo >> ${b * 15}) & 32767) AS key FROM $sim")
    val hi = (0 until 4).map(b =>
      s"SELECT doc_id, sh_lo, sh_hi, ${b + 4} AS band, ((sh_hi >> ${b * 15}) & 32767) AS key FROM $sim")
    (lo ++ hi).mkString("\nUNION ALL\n")
  }

  private lazy val simhashWideCte: String =
    "WITH " + wideSigCte("documents", "th", "simw")

  private lazy val simhashWideBandsSql: String = wideBandsSql("simw")

  /** DuckDB twin of [[Multimodal.syntheticImageGroups]] +
    * [[Multimodal.decodeImageHash]] ending in `ph(doc_id, w, h, dhash)`:
    * regenerate the id-arithmetic pixel field, ITU-R 601 integer luma,
    * 9x7 box-average cells (exact floor division — all values
    * non-negative, so DuckDB `//` == JVM `/`), one bit per
    * adjacent-column comparison. Shared by the signature row and the
    * near-dup pair row.
    */
  private lazy val phashCte: String =
    "WITH " + phashChainSql("", "SELECT doc_id FROM documents")

  /** DuckDB twin of [[Multimodal.mix48]] (the 48-bit avalanche pixel
    * mixer — see its scaladoc for the sf10 class-center degeneracy it
    * fixes), rendered as staged CTEs ending in `<p>bb(… base)`. ONE
    * generator serves the image, video, and strided-video chains, so
    * the three SQL renderings of the mixer cannot drift from each
    * other; drift from the Scala kernel is caught by every perceptual
    * oracle row.
    */
  private def mix48Sql(p: String, src: String, vExpr: String,
                       keep: String): String = {
    val M = "281474976710655" // 0xFFFFFFFFFFFF
    s"""${p}v0 AS (SELECT $keep, ($vExpr) AS v0 FROM $src),
       |${p}v1 AS (SELECT $keep, xor(v0, (v0 >> 13)) & $M AS v1 FROM ${p}v0),
       |${p}v2 AS (SELECT $keep, (v1 + ((v1 << 5) & $M)) & $M AS v2 FROM ${p}v1),
       |${p}v3 AS (SELECT $keep, xor(v2, (v2 >> 11)) AS v3 FROM ${p}v2),
       |${p}v4 AS (SELECT $keep, (v3 + ((v3 << 3) & $M)) & $M AS v4 FROM ${p}v3),
       |${p}bb AS (SELECT $keep, xor(v4, (v4 >> 17)) & 16777215 AS base
       |  FROM ${p}v4)""".stripMargin
  }

  /** The PNG-fixture pixel→hash replay chain, parameterized by a CTE
    * name prefix and an id-domain source (any SELECT producing
    * `doc_id`): the ONE definition behind [[phashCte]] and the
    * shifted-id arriving chains of the streaming image-gate oracle —
    * the two renderings consume the same text, so they structurally
    * cannot drift (the wideBandSlicesSql lesson).
    */
  private def phashChainSql(p: String, srcSql: String): String =
    s"""${p}img AS (SELECT doc_id, doc_id // 4 AS g, doc_id % 4 AS m,
      |  CAST(12 + (doc_id // 4) % 20 AS INT) AS w,
      |  CAST(10 + (doc_id // 4) % 15 AS INT) AS h,
      |  CAST('0x' || substr(md5('img:' || CAST(doc_id // 4 AS VARCHAR)), 1, 15)
      |    AS BIGINT) AS gs FROM ($srcSql)),
      |${p}xs AS (SELECT doc_id, g, m, w, h, gs, unnest(range(0, w)) AS x FROM ${p}img),
      |${p}pp AS (SELECT doc_id, g, m, w, h, gs, x, unnest(range(0, h)) AS y FROM ${p}xs),
      |${mix48Sql(p, s"${p}pp", "gs + x*40503 + y*70423",
                  "doc_id, w, h, x, y, m")},
      |${p}pxv AS (SELECT doc_id, w, h, x, y,
      |  (base & 16776960) | ((base + m*3) & 255) AS rgb FROM ${p}bb),
      |${p}lum AS (SELECT doc_id, w, h, (y*7)//h AS cy, (x*9)//w AS cx,
      |  ((rgb >> 16) & 255)*299 + ((rgb >> 8) & 255)*587
      |    + (rgb & 255)*114 AS luma
      |  FROM ${p}pxv),
      |${p}cells AS (SELECT doc_id, w, h, cy, cx,
      |  CAST(sum(luma) AS BIGINT) // CAST(count(*) AS BIGINT) AS avg
      |  FROM ${p}lum GROUP BY 1, 2, 3, 4, 5),
      |${p}ph AS (SELECT a.doc_id, a.w, a.h,
      |  CAST(coalesce(sum(CASE WHEN c.avg > a.avg
      |    THEN (CAST(1 AS BIGINT) << (a.cy*8 + a.cx))
      |    ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS dhash
      |  FROM ${p}cells a JOIN ${p}cells c ON a.doc_id = c.doc_id
      |    AND a.cy = c.cy AND c.cx = a.cx + 1
      |  WHERE a.cx < 8
      |  GROUP BY 1, 2, 3)""".stripMargin

  /** DuckDB twin of the WIDE two-word band slicing
    * ([[Dedup.hammingNearDupPairsWide]]): renders each slice of THE
    * shared [[Dedup.wideBandLayout]] definition as SQL — the Scala
    * banding and this generator consume the same (band, word, start,
    * width) rows, so the layouts structurally cannot drift. Emits
    * `SELECT doc_id, <lo>, <hi>, band, key FROM <src>` unions.
    */
  private def wideBandSlicesSql(src: String, loCol: String, loBits: Int,
                                hiCol: String, hiBits: Int,
                                maxHamming: Int): String =
    Dedup.wideBandLayout(loBits, hiBits, maxHamming).map { s =>
      val c = if (s.word == 0) loCol else hiCol
      s"SELECT doc_id, $loCol, $hiCol, ${s.band} AS band, " +
        s"($c >> ${s.start}) & ${(1L << s.width) - 1} AS key FROM $src"
    }.mkString("\nUNION ALL\n")

  /** Extends [[phashCte]]'s `cells` with the VERTICAL 54-bit word:
    * `phw(doc_id, w, h, dhash, vhash)` — bit `cx*6+cy` set iff the
    * LOWER cell strictly exceeds the upper (the Multimodal
    * verticalBits kernel in exact int64 SQL).
    */
  private lazy val phashWideCte: String = phashWideExtSql("")

  /** The vertical-word extension of [[phashChainSql]] for the same
    * prefix — `<p>phv`, `<p>phw` over `<p>cells`/`<p>ph`.
    */
  private def phashWideExtSql(p: String): String =
    s"""${p}phv AS (SELECT a.doc_id,
      |  CAST(coalesce(sum(CASE WHEN c.avg > a.avg
      |    THEN (CAST(1 AS BIGINT) << (a.cx*6 + a.cy))
      |    ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS vhash
      |  FROM ${p}cells a JOIN ${p}cells c ON a.doc_id = c.doc_id
      |    AND a.cx = c.cx AND c.cy = a.cy + 1
      |  WHERE a.cy < 6
      |  GROUP BY 1),
      |${p}phw AS (SELECT ${p}ph.doc_id, ${p}ph.w, ${p}ph.h, ${p}ph.dhash,
      |  ${p}phv.vhash
      |  FROM ${p}ph JOIN ${p}phv USING (doc_id))""".stripMargin

  /** DuckDB twin of [[Multimodal.syntheticAudioGroups]] +
    * [[Multimodal.decodeAudioHashWide]] ending in
    * `afp(doc_id, ehash, rhash)`: regenerate the designed per-segment
    * amplitude path (A[t] = 4096 + 64·(2·ones(t) − t), where ones(t)
    * counts the member-flipped salt bits below t) and period choice,
    * fold them to the EXACT segment features the kernel computes from
    * decoded PCM — E[t] = 64·A[t], D[t] = 2·A[t]·(2·64/p[t] − 1) —
    * then replay the envelope comparisons and the cross-multiplied
    * flux-ratio comparisons bit-for-bit. The values live only in the
    * WAV data section, so the Spark side can match iff it genuinely
    * decoded the samples.
    */
  private lazy val audioFpCte: String =
    "WITH " + audioFpChainSql("", "SELECT doc_id FROM documents")

  /** The one parameterized rendering behind [[audioFpCte]] and the
    * shifted-id arriving chains of the streaming audio-gate oracle
    * (same prefix/source convention as [[phashChainSql]]).
    */
  private def audioFpChainSql(p: String, srcSql: String): String =
    s"""${p}aud AS (SELECT doc_id, doc_id % 4 AS m,
      |  CAST('0x' || substr(md5('aud:' || CAST(doc_id // 4 AS VARCHAR)), 1, 15)
      |    AS BIGINT) AS gs,
      |  CAST('0x' || substr(md5('audp:' || CAST(doc_id // 4 AS VARCHAR)), 1, 15)
      |    AS BIGINT) AS gs2 FROM ($srcSql)),
      |${p}segt AS (SELECT doc_id, m, gs, gs2, unnest(range(0, 57)) AS t FROM ${p}aud),
      |${p}aamp AS (SELECT doc_id, gs2, t,
      |  4096 + 64 * (2 * len(list_filter(range(0, t), u ->
      |    xor((gs >> u) & 1,
      |        CASE WHEN (u = 13 OR u = 30 OR u = 47)
      |               AND (u - 13) // 17 < least(m, 3)
      |             THEN 1 ELSE 0 END) = 1)) - t) AS a
      |  FROM ${p}segt),
      |${p}aed AS (SELECT doc_id, t, CAST(64 * a AS BIGINT) AS e,
      |  CAST(2 * a * (CASE WHEN ((gs2 >> t) & 1) = 1 THEN 63 ELSE 31 END)
      |    AS BIGINT) AS d
      |  FROM ${p}aamp),
      |${p}aeh AS (SELECT a.doc_id, CAST(coalesce(sum(CASE WHEN b.e > a.e
      |    THEN (CAST(1 AS BIGINT) << a.t) ELSE CAST(0 AS BIGINT) END), 0)
      |    AS BIGINT) AS ehash
      |  FROM ${p}aed a JOIN ${p}aed b ON a.doc_id = b.doc_id AND b.t = a.t + 1
      |  WHERE a.t < 56 GROUP BY 1),
      |${p}arh AS (SELECT a.doc_id, CAST(coalesce(sum(CASE WHEN b.d * a.e > a.d * b.e
      |    THEN (CAST(1 AS BIGINT) << a.t) ELSE CAST(0 AS BIGINT) END), 0)
      |    AS BIGINT) AS rhash
      |  FROM ${p}aed a JOIN ${p}aed b ON a.doc_id = b.doc_id AND b.t = a.t + 1
      |  WHERE a.t < 54 GROUP BY 1),
      |${p}afp AS (SELECT e.doc_id, e.ehash, r.rhash
      |  FROM ${p}aeh e JOIN ${p}arh r USING (doc_id))""".stripMargin

  /** The video twin of [[phashWideCte]] over [[videoPhashCte]]'s
    * `vcells`: `vphw(doc_id, dhash, vhash)`.
    */
  private lazy val videoPhashWideCte: String =
    """vphv AS (SELECT a.doc_id,
      |  CAST(coalesce(sum(CASE WHEN c.avg > a.avg
      |    THEN (CAST(1 AS BIGINT) << (a.cx*6 + a.cy))
      |    ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS vhash
      |  FROM vcells a JOIN vcells c ON a.doc_id = c.doc_id
      |    AND a.cx = c.cx AND c.cy = a.cy + 1
      |  WHERE a.cy < 6
      |  GROUP BY 1),
      |vphw AS (SELECT vph.doc_id, vph.dhash, vphv.vhash
      |  FROM vph JOIN vphv USING (doc_id))""".stripMargin

  /** DuckDB twin of [[Multimodal.syntheticVideoGroups]] +
    * [[Multimodal.decodeVideoFrameHash]] ending in
    * `vph(doc_id, w, h, dhash)`: regenerate the id-arithmetic FRAME
    * pixel field (the bytes the Scala side can only reach through a
    * genuine DIB frame decode — stride, bottom-up rows, BGR order) and
    * replay the shared luma → 9x7 → adjacent-column dHash kernel in
    * exact int64 math. The pixel mix constants differ from the image
    * fixture's, so a video pass cannot free-ride on the image oracle.
    */
  private lazy val videoPhashCte: String =
    s"""WITH vimg AS (SELECT doc_id, doc_id // 4 AS g, doc_id % 4 AS m,
      |  CAST(12 + (doc_id // 4) % 20 AS INT) AS w,
      |  CAST(10 + (doc_id // 4) % 15 AS INT) AS h,
      |  CAST('0x' || substr(md5('vid:' || CAST(doc_id // 4 AS VARCHAR)), 1, 15)
      |    AS BIGINT) AS gs FROM documents),
      |vxs AS (SELECT doc_id, g, m, w, h, gs, unnest(range(0, w)) AS x FROM vimg),
      |vpp AS (SELECT doc_id, g, m, w, h, gs, x, unnest(range(0, h)) AS y FROM vxs),
      |${mix48Sql("v", "vpp", "gs + x*48271 + y*69621",
                  "doc_id, w, h, x, y, m")},
      |vlum AS (SELECT doc_id, w, h, (y*7)//h AS cy, (x*9)//w AS cx,
      |  ((base >> 16) & 255)*299 + ((base >> 8) & 255)*587
      |    + ((base + m*3) & 255)*114 AS luma
      |  FROM vbb),
      |vcells AS (SELECT doc_id, w, h, cy, cx,
      |  CAST(sum(luma) AS BIGINT) // CAST(count(*) AS BIGINT) AS avg
      |  FROM vlum GROUP BY 1, 2, 3, 4, 5),
      |vph AS (SELECT a.doc_id, a.w, a.h,
      |  CAST(coalesce(sum(CASE WHEN c.avg > a.avg
      |    THEN (CAST(1 AS BIGINT) << (a.cy*8 + a.cx))
      |    ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS dhash
      |  FROM vcells a JOIN vcells c ON a.doc_id = c.doc_id
      |    AND a.cy = c.cy AND c.cx = a.cx + 1
      |  WHERE a.cx < 8
      |  GROUP BY 1, 2, 3)""".stripMargin

  /** DuckDB twin of [[Multimodal.syntheticVideoGroupsStrided]] (4
    * frames, member-scrambled frame 0) +
    * [[Multimodal.decodeVideoFrameHashesStrided]] at k = 3 (strided
    * frame set {0, 1, 2} of 4), ending in `vsph(doc_id, f, dhash)`:
    * the per-frame pixel field is arithmetic in (g, m, f, x, y) with
    * the `m·1000003` frame-0 scramble, replayed through the shared
    * luma → 9x7 → adjacent-column dHash kernel in exact int64 math.
    */
  private lazy val videoStridedPhashCte: String =
    "WITH " + videoStridedChainSql("", "SELECT doc_id FROM documents")

  /** The one parameterized rendering behind [[videoStridedPhashCte]]
    * and the shifted-id arriving chains of the streaming video-gate
    * oracle (same prefix/source convention as [[phashChainSql]]):
    * CTEs `<p>vsimg .. <p>vsph`.
    */
  private def videoStridedChainSql(p: String, srcSql: String): String =
    s"""${p}vsimg AS (SELECT doc_id, doc_id // 4 AS g, doc_id % 4 AS m,
      |  CAST(12 + (doc_id // 4) % 20 AS INT) AS w,
      |  CAST(10 + (doc_id // 4) % 15 AS INT) AS h,
      |  CAST('0x' || substr(md5('vids:' || CAST(doc_id // 4 AS VARCHAR)), 1, 15)
      |    AS BIGINT) AS gs FROM ($srcSql)),
      |${p}vsf AS (SELECT doc_id, g, m, w, h, gs, unnest([0, 1, 2]) AS f
      |  FROM ${p}vsimg),
      |${p}vsxs AS (SELECT doc_id, g, m, w, h, gs, f, unnest(range(0, w)) AS x
      |  FROM ${p}vsf),
      |${p}vspp AS (SELECT doc_id, g, m, w, h, gs, f, x, unnest(range(0, h)) AS y
      |  FROM ${p}vsxs),
      |${mix48Sql(s"${p}vs", s"${p}vspp",
                  "gs + x*48271 + y*69621 + f*1299721 " +
                    "+ CASE WHEN f = 0 THEN m*1000003 ELSE 0 END",
                  "doc_id, w, h, f, x, y, m")},
      |${p}vslum AS (SELECT doc_id, f, (y*7)//h AS cy, (x*9)//w AS cx,
      |  ((base >> 16) & 255)*299 + ((base >> 8) & 255)*587
      |    + ((base + m*3) & 255)*114 AS luma
      |  FROM ${p}vsbb),
      |${p}vscells AS (SELECT doc_id, f, cy, cx,
      |  CAST(sum(luma) AS BIGINT) // CAST(count(*) AS BIGINT) AS avg
      |  FROM ${p}vslum GROUP BY 1, 2, 3, 4),
      |${p}vsph AS (SELECT a.doc_id, a.f,
      |  CAST(coalesce(sum(CASE WHEN c.avg > a.avg
      |    THEN (CAST(1 AS BIGINT) << (a.cy*8 + a.cx))
      |    ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS dhash
      |  FROM ${p}vscells a JOIN ${p}vscells c ON a.doc_id = c.doc_id
      |    AND a.f = c.f AND a.cy = c.cy AND c.cx = a.cx + 1
      |  WHERE a.cx < 8
      |  GROUP BY 1, 2)""".stripMargin

  /** DuckDB twin of [[Multimodal.syntheticVideoGroupsMjpeg]] +
    * the MJPEG frame decode, ending in `mphw(doc_id, dhash, vhash)`
    * (no leading WITH — composes after other CTEs; `offset` shifts the
    * fixture ids so a mixed-codec corpus can union disjoint id
    * ranges). JPEG is lossy, so unlike the DIB twins this replays the
    * DESIGNED cell values (h60-derived, ≥20 apart between adjacent
    * cells — an order of magnitude above the bounded DC-quantization
    * decode error), not the pixel bytes: every adjacent-cell
    * comparison, and therefore every hash bit, is deterministic by
    * construction while the Spark side must genuinely decompress the
    * `00dc` JPEG chunks to reproduce it.
    */
  private def mjpegPhashCtes(offset: Long): String =
    s"""mj AS (SELECT doc_id + $offset AS doc_id,
       |  (doc_id + $offset) // 4 AS g, (doc_id + $offset) % 4 AS m
       |  FROM documents),
       |mcells AS (SELECT doc_id, cxs.cx AS cx, cys.cy AS cy,
       |  40*(CAST('0x' || substr(md5('mj:' || CAST(g AS VARCHAR) || ':' ||
       |      CAST(cxs.cx AS VARCHAR) || ':' || CAST(cys.cy AS VARCHAR)),
       |      1, 15) AS BIGINT) % 5)
       |    + 20*((cxs.cx + cys.cy) % 2) + 20 + m AS v
       |  FROM mj, (SELECT unnest(range(0, 9)) AS cx) cxs,
       |       (SELECT unnest(range(0, 7)) AS cy) cys),
       |mph AS (SELECT a.doc_id,
       |  CAST(coalesce(sum(CASE WHEN c.v > a.v
       |    THEN (CAST(1 AS BIGINT) << (a.cy*8 + a.cx))
       |    ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS dhash
       |  FROM mcells a JOIN mcells c ON a.doc_id = c.doc_id
       |    AND a.cy = c.cy AND c.cx = a.cx + 1
       |  WHERE a.cx < 8
       |  GROUP BY 1),
       |mphv AS (SELECT a.doc_id,
       |  CAST(coalesce(sum(CASE WHEN c.v > a.v
       |    THEN (CAST(1 AS BIGINT) << (a.cx*6 + a.cy))
       |    ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS vhash
       |  FROM mcells a JOIN mcells c ON a.doc_id = c.doc_id
       |    AND a.cx = c.cx AND c.cy = a.cy + 1
       |  WHERE a.cy < 6
       |  GROUP BY 1),
       |mphw AS (SELECT mph.doc_id, mph.dhash, mphv.vhash
       |  FROM mph JOIN mphv USING (doc_id))""".stripMargin

  /** The PER-FRAME vertical 54-bit word over [[videoStridedPhashCte]]'s
    * `vscells` — [[phashWideCte]]'s strided twin, ending in
    * `vsphw(doc_id, f, dhash, vhash)`: one two-word signature row per
    * (video, strided frame), the member shape the wide banded SET
    * machinery consumes.
    */
  private lazy val videoStridedPhashWideCte: String =
    videoStridedWideExtSql("")

  /** The per-frame vertical-word extension of [[videoStridedChainSql]]
    * for the same prefix — `<p>vsphv`, `<p>vsphw` over
    * `<p>vscells`/`<p>vsph` (the strided twin of [[phashWideExtSql]]).
    */
  private def videoStridedWideExtSql(p: String): String =
    s"""${p}vsphv AS (SELECT a.doc_id, a.f,
      |  CAST(coalesce(sum(CASE WHEN c.avg > a.avg
      |    THEN (CAST(1 AS BIGINT) << (a.cx*6 + a.cy))
      |    ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS vhash
      |  FROM ${p}vscells a JOIN ${p}vscells c ON a.doc_id = c.doc_id
      |    AND a.f = c.f AND a.cx = c.cx AND c.cy = a.cy + 1
      |  WHERE a.cy < 6
      |  GROUP BY 1, 2),
      |${p}vsphw AS (SELECT ${p}vsph.doc_id, ${p}vsph.f, ${p}vsph.dhash,
      |  ${p}vsphv.vhash
      |  FROM ${p}vsph JOIN ${p}vsphv USING (doc_id, f))""".stripMargin

  /** DuckDB twin of the maxHamming=8 simhash band slices over `sim` —
    * the same 9 x 7-bit (last 4-bit) slices the Scala side derives.
    */
  private lazy val simhashBandsSql: String = {
    val nBands = 9
    val width = 7
    (0 until nBands).map { b =>
      val w = math.min(width, 60 - b * width)
      val mask = (1L << math.max(w, 1)) - 1
      s"SELECT doc_id, simhash, $b AS band, ((simhash >> ${b * width}) & $mask) AS key FROM sim"
    }.mkString("\nUNION ALL\n")
  }

  /** All k=3 grams WITH multiplicity (DuckDB twin of
    * TextOps.wordShinglesAll(k=3) — no list_distinct).
    */
  private def gramsAllSql(ws: String) =
    s"""CASE WHEN len($ws) - 2 >= 1
       |  THEN list_transform(range(1, len($ws) - 1),
       |         i -> array_to_string(($ws)[i:i+2], ' '))
       |  ELSE [array_to_string($ws, ' ')] END""".stripMargin

  /** shared CTEs: shingle sets / minhash signature over documents */
  private val shCte =
    s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
       |sh AS (SELECT doc_id, ${shinglesSql("ws")} AS sh FROM norm)""".stripMargin

  /** double-cast embedding vectors */
  private val vecCte =
    """WITH v AS (SELECT vec_id, label,
      |  list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)""".stripMargin

  /** integer-exact dot of two INT-list expressions, accumulated in BIGINT
    * (DuckDB twin of the codegen'd graft_dot_int — exact, order-free)
    */
  private def intDotSql(a: String, b: String) =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, len($a) + 1),
       |    i -> CAST(($a)[i] AS BIGINT) * ($b)[i])),
       |  (acc, x) -> acc + x)""".stripMargin

  /** unit-normalized vectors + the corpus-wide symmetric-SQ8 scale:
    * u = v/||v|| in the pinned normalize shape, gmax = max |component|
    */
  private val sq8Cte =
    s"""$vecCte,
       |u AS (SELECT vec_id,
       |  list_transform(v, x -> x / sqrt(${dotSql("v", "v")})) AS u FROM v),
       |g AS (SELECT max(abs(x)) AS gmax
       |  FROM (SELECT unnest(u) AS x FROM u))""".stripMargin

  /** Shared DuckDB twin of the 4-table x 4-plane LSH top-5 probe over
    * queries `vec_id < 10` — the inline, write-time-indexed, and
    * incrementally-grown variants must all return exactly these rows
    * (bucket assignment is a pure per-row function), so they share one
    * oracle. Mirrors the default hot-bucket guard
    * ([[graft.llm.Similarity.DefaultMaxBucketWidth]]): (tbl, bucket)
    * groups wider than the cap are excluded from candidate generation in
    * BOTH engines — a no-op on benign corpora, exact parity on
    * degenerate ones.
    */
  private lazy val lshTopK5OracleSql: String = {
    val bucket = (v: String, t: Int) => (0 until 4).map(p =>
      s"(CASE WHEN ${projSql(v, t * 4 + p)} >= 0 THEN ${1L << p} ELSE 0 END)")
      .mkString("(", " + ", ")::BIGINT")
    val bv = (0 until 4).map(t =>
      s"SELECT vec_id, v, $t AS tbl, ${bucket("v", t)} AS bucket FROM v")
      .mkString("\nUNION ALL\n")
    val cap = graft.llm.Similarity.DefaultMaxBucketWidth
    s"""$vecCte,
       |bv AS ($bv),
       |hot AS (SELECT tbl, bucket FROM bv GROUP BY tbl, bucket
       |  HAVING count(*) > $cap),
       |cand AS (SELECT DISTINCT q.vec_id AS query_id, q.v AS qv,
       |  c.vec_id AS cand_id, c.v AS cv
       |  FROM bv c JOIN bv q
       |  ON c.tbl = q.tbl AND c.bucket = q.bucket AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10 AND NOT EXISTS (SELECT 1 FROM hot h
       |    WHERE h.tbl = c.tbl AND h.bucket = c.bucket)),
       |ranked AS (SELECT query_id, cand_id, ${cosSql("qv", "cv")} AS cos,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY ${cosSql("qv", "cv")} DESC, cand_id) AS INT) AS rank
       |  FROM cand)
       |SELECT query_id, cand_id, cos, rank FROM ranked WHERE rank <= 5""".stripMargin
  }

  /** Shared contract construction of the two semantic-dedup rows: given
    * the decision frame (id, cell, rep_id, keep), recompute the pair
    * graph INDEPENDENTLY from raw vectors over the decision's own cells
    * and emit one flag row per corpus vector — (a) dropped members have
    * a same-cell witness clearing the threshold, (b) no two KEPT
    * members of one cell clear it, (c) every representative is itself
    * kept. KMeans cell boundaries aren't SQL-replicable, so this is the
    * IVF-row contract pattern: the oracle pins the flags to 1.
    */
  private def semanticDedupContract(s: org.apache.spark.sql.SparkSession,
                                    dir: String,
                                    decision: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // 0.4: tight enough that a "semantic duplicate" means a genuinely
    // near-identical embedding (the SemDeDup meaning) and the pair
    // graph stays clique-ish (round-11 probe: 0.35 chains 1.2k weak
    // pairs into an 18-round closure; 0.4 keeps 25-300 real pairs
    // across SFs with drops at every scale).
    val thr = 0.4
    val dd = decision.transform(Materialize.pin)
    // Pair over the EFFECTIVE pairing key (pair_cell: the coarse cell,
    // sub-split when the pathological-cell guard fired) so contract (b)
    // judges exactly the pairs the decision could have seen.
    val members = dd.select(col("id"), col("pair_cell"))
      .join(Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding")), Seq("id"))
    val pairs = Dedup.embeddingNearDupPairs(members, "id", "embedding",
      "pair_cell", thr).transform(Materialize.pin)
    val witnessed = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct().withColumn("__hasw", lit(1))
    val keptViolation = pairs
      .join(dd.select(col("id").as("id_a"), col("keep").as("__ka")), Seq("id_a"))
      .join(dd.select(col("id").as("id_b"), col("keep").as("__kb")), Seq("id_b"))
      .filter(col("__ka") === 1 && col("__kb") === 1)
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct().withColumn("__viol", lit(1))
    dd.join(witnessed, Seq("id"), "left")
      .join(keptViolation, Seq("id"), "left")
      .join(dd.select(col("id").as("rep_id"), col("keep").as("__repkeep")),
        Seq("rep_id"), "left")
      .select(col("id").as("vec_id"),
        (col("keep") === 1 || col("__hasw").isNotNull).cast("int")
          .as("dropped_has_witness_ok"),
        col("__viol").isNull.cast("int").as("kept_independent_ok"),
        (col("__repkeep") === 1).cast("int").as("rep_kept_ok"))
  }

  private val semanticContractOracleSql: String =
    """SELECT vec_id, 1 AS dropped_has_witness_ok,
      |1 AS kept_independent_ok, 1 AS rep_kept_ok
      |FROM embeddings""".stripMargin

  val all: Map[String, Q] = Map(

    // Exact dedup: the corpus unioned with a case/whitespace-perturbed
    // copy of itself; normalization collapses each pair to one group.
    "llm_dedup_exact" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val perturbed = docs.select(
          (col("doc_id") + 1000000L).as("doc_id"),
          upper(concat(lit("  "), regexp_replace(col("text"), " ", "  "), lit(" ")))
            .as("text"))
        Dedup.exactDedup(docs.select("doc_id", "text").unionByName(perturbed),
          "doc_id", "text")
      },
      // Group by NORMALIZED TEXT, not per-doc: the generated corpus can
      // contain genuinely duplicate texts (8 pairs at sf0.1), which
      // collapse with their perturbed twins into one group of 2k members
      // under min-id representation — exactly what exactDedup computes.
      Some(s"""SELECT min(doc_id) AS doc_id,
              |  CAST(2 * count(*) AS BIGINT) AS n_copies
              |FROM documents GROUP BY ${normSql("text")}""".stripMargin)),

    // MinHash-LSH near-dup pairs: 3-word shingles, 8 bands x 2 rows,
    // exact-Jaccard verify >= 0.5.
    "llm_dedup_minhash_lsh" -> Q(
      (s, dir) => Dedup.minhashLshPairs(Tables.documents(s, dir),
        "doc_id", "text", shingleK = 3, bands = 8, rowsPerBand = 2,
        threshold = 0.5),
      Some {
        val P = TextOps.MinhashP
        val mins = (0 until 16).map { i =>
          val (a, b) = TextOps.minhashParams(i)
          s"list_min(list_transform(hs, h -> ($a * h + $b) % $P))"
        }.mkString("[", ", ", "]")
        s"""$shCte,
           |hs AS (SELECT doc_id, sh,
           |  list_transform(sh, s -> ${h60("s")} % $P) AS hs FROM sh),
           |sig AS (SELECT doc_id, sh, $mins AS sig FROM hs),
           |banded AS (SELECT doc_id, sh, b.band,
           |  array_to_string(sig[b.band*2+1:b.band*2+2], '_') AS bkey
           |  FROM sig, (SELECT unnest(range(0, 8)) AS band) b),
           |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           |  a.sh AS sa, b.sh AS sb
           |  FROM banded a JOIN banded b
           |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
           |SELECT id_a, id_b,
           |  len(list_intersect(sa, sb))::DOUBLE /
           |  (len(sa) + len(sb) - len(list_intersect(sa, sb)))::DOUBLE AS jaccard
           |FROM cand
           |WHERE len(list_intersect(sa, sb))::DOUBLE /
           |  (len(sa) + len(sb) - len(list_intersect(sa, sb)))::DOUBLE >= 0.5""".stripMargin
      }),

    // Write-time near-dup TEXT index, probed with a delta batch: the
    // corpus's (doc, band) signature rows live (band, bkt)-partitioned
    // with shingles carried in the index, so "is this new batch a
    // near-dup of anything in the corpus?" is a DPP-pruned read + key
    // equi-join + in-index Jaccard verify — the corpus text is never
    // re-shingled. Same signature params as llm_dedup_minhash_lsh;
    // delta = doc_id < 50.
    "llm_neardup_index_probe" -> Q(
      (s, dir) => {
        val fix = ensureNearDupIndex(s, dir)
        Dedup.probeNearDupIndex(s, fix,
          Tables.documents(s, dir).filter(col("doc_id") < 50),
          "doc_id", "text", shingleK = 3, bands = 8, rowsPerBand = 2,
          nBuckets = 64, threshold = 0.5)
      },
      Some {
        val P = TextOps.MinhashP
        val mins = (0 until 16).map { i =>
          val (a, b) = TextOps.minhashParams(i)
          s"list_min(list_transform(hs, h -> ($a * h + $b) % $P))"
        }.mkString("[", ", ", "]")
        s"""$shCte,
           |hs AS (SELECT doc_id, sh,
           |  list_transform(sh, s -> ${h60("s")} % $P) AS hs FROM sh),
           |sig AS (SELECT doc_id, sh, $mins AS sig FROM hs),
           |banded AS (SELECT doc_id, sh, b.band,
           |  array_to_string(sig[b.band*2+1:b.band*2+2], '_') AS bkey
           |  FROM sig, (SELECT unnest(range(0, 8)) AS band) b),
           |cand AS (SELECT DISTINCT q.doc_id AS query_id, c.doc_id AS cand_id,
           |  q.sh AS qs, c.sh AS cs
           |  FROM banded c JOIN banded q
           |  ON c.band = q.band AND c.bkey = q.bkey AND c.doc_id <> q.doc_id
           |  WHERE q.doc_id < 50)
           |SELECT query_id, cand_id,
           |  len(list_intersect(qs, cs))::DOUBLE /
           |  (len(qs) + len(cs) - len(list_intersect(qs, cs)))::DOUBLE AS jaccard
           |FROM cand
           |WHERE len(list_intersect(qs, cs))::DOUBLE /
           |  (len(qs) + len(cs) - len(list_intersect(qs, cs)))::DOUBLE >= 0.5""".stripMargin
      }),

    // EXACT-dup write-time index probe — the 4th BandedIndex family.
    // The delta is a whitespace/case-perturbed copy of every 7th doc
    // (ids offset by 1e6), so each delta doc matches at least its own
    // original under text normalization at EVERY scale factor; the
    // carried-md5 verify makes a 60-bit bucket collision unable to
    // fabricate a pair. The oracle replays normalized-text equality
    // directly.
    "llm_exactdup_index_probe" -> Q(
      (s, dir) => {
        val fix = ensureExactDupIndex(s, dir)
        val delta = Tables.documents(s, dir)
          .filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            upper(concat(lit("  "), regexp_replace(col("text"), " ", "  "),
              lit(" "))).as("text"))
        Dedup.probeExactDupIndex(s, fix, delta, "doc_id", "text", nBuckets = 64)
      },
      Some(s"""SELECT d.doc_id + 1000000 AS query_id, c.doc_id AS cand_id
           |FROM documents d JOIN documents c
           |  ON ${normSql("d.text")} = ${normSql("c.text")}
           |WHERE d.doc_id % 7 = 0""".stripMargin)),

    // INDEX MAINTENANCE — COMPACTION. A base exact-dup index plus three
    // appended delta batches leaves up to four files per (band, bkt)
    // directory — the small-files drift every long-lived banded layout
    // accumulates under steady ingest (BASELINE.md round-10 sweep:
    // probe cost becomes per-file open overhead). The maintenance
    // dataflow (build, append x3, pre-probe, compact) is the WRITE-time
    // step of the layout and runs once per content fingerprint in
    // warmup (the prepareIndexes posture): the timed output is the
    // post-compaction probe, which the oracle recomputes from
    // normalized-text equality — a compaction that lost or duplicated
    // rows hash-mismatches — with contract columns asserting the file
    // count strictly shrank, the row count survived exactly, and the
    // pre-compaction probe returned the identical pair set.
    "llm_index_compact" -> Q(
      (s, dir) => {
        // The maintenance dataflow (build evens, append odds x3,
        // pre-compaction probe, compact) runs ONCE per content
        // fingerprint in ensureCompactedExactDupIndex — Bench pays it in
        // warmup, matching every other write-time layout: the graded,
        // timed dataflow is the post-compaction probe + contract. The
        // pre-compaction pair set and the file/row counters persist in
        // the lifecycle sidecar; a compaction that lost or duplicated
        // rows still hash-mismatches the oracle here.
        val docs = Tables.documents(s, dir)
        val fix = ensureCompactedExactDupIndex(s, dir)
        val meta = s.read.parquet(s"${fix}_life/meta").head()
        val beforeProbe = s.read.parquet(s"${fix}_life/before_probe")
        val afterProbe = Dedup.probeExactDupIndex(s, fix,
          compactProbeDelta(docs), "doc_id", "text", nBuckets = 16)
        // Row-level probe equality: a pair present on only one side
        // survives the full-outer join with a 0 flag (and, if the pair
        // sets diverge, a row-count mismatch on top).
        afterProbe.withColumn("__a", lit(1))
          .join(beforeProbe.select(col("query_id"), col("cand_id"),
            lit(1).as("__b")), Seq("query_id", "cand_id"), "full_outer")
          .select(col("query_id"), col("cand_id"),
            (col("__a").isNotNull && col("__b").isNotNull).cast("int")
              .as("probe_unchanged"),
            lit(if (meta.getAs[Long]("files_after") <
              meta.getAs[Long]("files_before")) 1 else 0).as("files_reduced"),
            lit(if (meta.getAs[Long]("rows_after") ==
              meta.getAs[Long]("n_docs")) 1 else 0).as("rows_preserved"))
      },
      Some(s"""SELECT d.doc_id + 1000000 AS query_id, c.doc_id AS cand_id,
           |  1 AS probe_unchanged, 1 AS files_reduced, 1 AS rows_preserved
           |FROM documents d JOIN documents c
           |  ON ${normSql("d.text")} = ${normSql("c.text")}
           |WHERE d.doc_id % 7 = 0""".stripMargin)),

    // INDEX MAINTENANCE — IVF-PQ COMPACTION. The cell-partitioned ANN
    // layouts accumulate one file per append per touched cell exactly
    // like the banded families, and compact through the same
    // rename-aside core. Maintenance (train + write evens, append odds
    // in THREE delta batches so every cell directory ends multi-file,
    // pre-probe, compact) runs once per fingerprint in warmup. The
    // corpus and training set match ensureGrownIvfPqIndex's, so
    // per-query k_returned=5 holds wherever llm_sim_topk_pq_index's
    // contract does; probe_unchanged asserts row-identical
    // pre/post-compaction ANN results (the pre-probe persists from
    // BEFORE the swap renamed the files it read), and the file/row
    // contract flags mirror llm_index_compact.
    "llm_ivfpq_compact" -> Q(
      (s, dir) => {
        // Maintenance (build evens, append odds x3, pre-compaction
        // probe, compact) runs once per fingerprint in warmup
        // (ensureCompactedIvfPqIndex — the llm_index_compact posture);
        // the timed dataflow is the post-compaction ANN probe + the
        // row-identity contract against the persisted pre-probe.
        val emb = Tables.embeddings(s, dir)
        val fix = ensureCompactedIvfPqIndex(s, dir)
        val meta = s.read.parquet(s"${fix}_life/meta").head()
        val beforeProbe = s.read.parquet(s"${fix}_life/before_probe")
        Similarity.ivfPqTopKFromIndex(s, fix, emb,
            "vec_id", "embedding", col("vec_id") < 10,
            k = 5, nProbe = 5, oversample = 8)
          .withColumn("__a", lit(1))
          .join(beforeProbe.withColumn("__b", lit(1)),
            Seq("query_id", "cand_id"), "full_outer")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).cast("int").as("k_returned"),
            min((col("__a").isNotNull && col("__b").isNotNull).cast("int"))
              .as("probe_unchanged"))
          .select(col("query_id"), col("k_returned"), col("probe_unchanged"),
            lit(if (meta.getAs[Long]("files_after") <
              meta.getAs[Long]("files_before")) 1 else 0).as("files_reduced"),
            lit(if (meta.getAs[Long]("rows_after") ==
              meta.getAs[Long]("n_docs")) 1 else 0).as("rows_preserved"))
      },
      Some("""SELECT DISTINCT vec_id AS query_id, CAST(5 AS INT) AS k_returned,
             |CAST(1 AS INT) AS probe_unchanged, CAST(1 AS INT) AS files_reduced,
             |CAST(1 AS INT) AS rows_preserved
             |FROM embeddings WHERE vec_id < 10""".stripMargin)),

    // INDEX MAINTENANCE — WHOLE-INDEX RETRAIN (the drift fixture). An
    // IVF-PQ index trained on HALF the corpus (evens) then grown with
    // the other half against the frozen artifacts is the documented
    // drift posture; rebuildIvfPqIndex retrains both quantizers on the
    // full current corpus and atomically swaps the layout. The output
    // asserts the rebuilt index's ANN contract against float brute
    // force AND that the rebuilt layout probes row-identically to an
    // index built from scratch on the same corpus (training is
    // deterministic, so rebuild == fresh build exactly).
    "llm_ivfpq_rebuild" -> Q(
      (s, dir) => {
        // The drift lifecycle (train evens, grow with odds, retrain +
        // atomic swap, from-scratch reference build) runs once per
        // fingerprint in warmup (ensureRebuiltIvfPqIndex); the timed
        // dataflow is the rebuilt-index probe, the float brute-force
        // contract, and the rebuilt==fresh row-identity check.
        val emb = Tables.embeddings(s, dir)
        val (fix, ref) = ensureRebuiltIvfPqIndex(s, dir)
        def probe(p: String) = Similarity.ivfPqTopKFromIndex(s, p, emb,
          "vec_id", "embedding", col("vec_id") < 10,
          k = 5, nProbe = 5, oversample = 8)
        val rebuilt = probe(fix).transform(Materialize.pin)
        val q = emb.filter(col("vec_id") < 10)
        Similarity.annContract(rebuilt,
            Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5),
            emb, "vec_id", "embedding", k = 5, recallFloor = 0.2)
          .join(Similarity.resultsMatchPerQuery(rebuilt, probe(ref))
            .withColumnRenamed("rows_match", "rebuilt_matches_fresh"),
            Seq("query_id"))
      },
      Some("""SELECT DISTINCT vec_id AS query_id, CAST(5 AS INT) AS k_returned,
             |CAST(1 AS INT) AS cos_monotone_ok, CAST(1 AS INT) AS cos_exact_ok,
             |CAST(1 AS INT) AS recall_floor_ok, CAST(1 AS INT) AS rebuilt_matches_fresh
             |FROM embeddings WHERE vec_id < 10""".stripMargin)),

    // Streaming INGEST DEDUP GATE, batch parity: an arriving batch mixes
    // perturbed copies of corpus docs (whitespace/case noise — must be
    // REJECTED by normalized-text membership) with genuinely novel docs
    // (suffixed text — must pass). The gate is the per-micro-batch body
    // of [[graft.streaming.Streams.startDedupGateSink]]: a DPP-pruned
    // probe of the write-time exact-dup index + left-anti on the id.
    // StreamsSpec replays the same dataflow through MemoryStream,
    // including the cross-batch append that rejects a later duplicate of
    // an earlier ACCEPTED row.
    "llm_stream_dedup_gate" -> Q(
      (s, dir) => {
        val fix = ensureExactDupIndex(s, dir)
        val docs = Tables.documents(s, dir)
        val arriving = docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            upper(concat(lit(" "), regexp_replace(col("text"), " ", "   "),
              lit("  "))).as("text"))
          .unionByName(docs.filter(col("doc_id") % 7 === 3)
            .select((col("doc_id") + 3000000L).as("doc_id"),
              concat(col("text"), lit(" novelsuffix"),
                col("doc_id").cast("string")).as("text")))
        graft.streaming.Streams.dedupGateBatch(s, fix, arriving,
          "doc_id", "text", nBuckets = 64)
      },
      Some(s"""WITH arriving AS (
           |  SELECT doc_id + 2000000 AS doc_id,
           |    upper(' ' || regexp_replace(text, ' ', '   ', 'g') || '  ') AS text
           |  FROM documents WHERE doc_id % 7 = 0
           |  UNION ALL
           |  SELECT doc_id + 3000000 AS doc_id,
           |    text || ' novelsuffix' || doc_id AS text
           |  FROM documents WHERE doc_id % 7 = 3)
           |SELECT a.doc_id, a.text FROM arriving a
           |WHERE NOT EXISTS (SELECT 1 FROM documents c
           |  WHERE ${normSql("c.text")} = ${normSql("a.text")})""".stripMargin)),

    // Streaming NEAR-dup gate, batch parity: the exact gate's near-dup
    // twin over the wide-simhash index. The arriving batch mixes
    // token-REVERSED copies of corpus docs (same token bag, different
    // string — verbatim membership misses them, the bag-of-words wide
    // simhash is identical so hamming = 0 rejects them) with suffixed
    // novel docs; membership is wide-hamming <= 7 against the corpus
    // index. The oracle replays both sig chains, the band split, and
    // the NOT-EXISTS membership decision row-for-row.
    "llm_stream_neardup_gate" -> Q(
      (s, dir) => {
        val fix = ensureSimhashWideIndex(s, dir)
        val docs = Tables.documents(s, dir)
        val arriving = docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
          .unionByName(docs.filter(col("doc_id") % 7 === 3)
            .select((col("doc_id") + 3000000L).as("doc_id"),
              concat(col("text"), lit(" novelsuffix"),
                col("doc_id").cast("string")).as("text")))
        graft.streaming.Streams.nearDupGateBatch(s, fix, arriving,
          "doc_id", "text", maxHamming = 7)
      },
      Some(s"""WITH arrx AS (
           |  SELECT doc_id + 2000000 AS doc_id,
           |    array_to_string(list_reverse(string_split(text, ' ')), ' ') AS text
           |  FROM documents WHERE doc_id % 7 = 0
           |  UNION ALL
           |  SELECT doc_id + 3000000 AS doc_id,
           |    text || ' novelsuffix' || doc_id AS text
           |  FROM documents WHERE doc_id % 7 = 3),
           |${wideSigCte("documents", "thc", "simc")},
           |${wideSigCte("arrx", "tha", "sima")},
           |bandedc AS (${wideBandsSql("simc")}),
           |bandeda AS (${wideBandsSql("sima")}),
           |hits AS (SELECT DISTINCT a.doc_id FROM bandeda a JOIN bandedc c
           |  ON a.band = c.band AND a.key = c.key
           |  WHERE bit_count(xor(a.sh_lo, c.sh_lo))
           |    + bit_count(xor(a.sh_hi, c.sh_hi)) <= 7)
           |SELECT a.doc_id, a.text FROM arrx a
           |WHERE NOT EXISTS (SELECT 1 FROM hits h
           |  WHERE h.doc_id = a.doc_id)""".stripMargin)),

    // Streaming PERCEPTUAL IMAGE gate, batch parity: the multimodal
    // member of the gate family over the write-time WIDE image-hash
    // index. The arriving batch mixes RE-UPLOADS (corpus images under
    // fresh ids — byte-identical payloads, so the probe sees hamming 0
    // and must reject them; the exact case a 100 TB image ingest hits
    // first) with NOVEL images (shifted-id groups whose md5 salts are
    // unseen — accepted). The gate is the per-micro-batch corpus
    // decision of [[graft.streaming.Streams.startImageGateSink]]: one
    // delta decode, a DPP-pruned index probe, left-anti on the id.
    // The oracle replays the full pixel→hash chain for BOTH id
    // domains (one parameterized chain definition), the shared wide
    // band slicing, and the NOT-EXISTS membership decision
    // row-for-row. StreamsSpec drives the same dataflow through
    // MemoryStream incl. the cross-batch append and intra-batch check.
    "llm_stream_image_gate" -> Q(
      (s, dir) => {
        implicit val sp = s
        val fix = ensureImageHashWideIndex(s, dir)
        val docs = Tables.documents(s, dir)
        val reup = Multimodal.syntheticImageGroups(
            docs.filter(col("doc_id") % 7 === 0), "doc_id").toDF()
          .withColumn("media_id", col("media_id") + 2000000L)
        val novel = Multimodal.syntheticImageGroups(
            docs.filter(col("doc_id") % 7 === 3)
              .select((col("doc_id") + 9000000L).as("doc_id")), "doc_id")
          .toDF()
        graft.streaming.Streams.imageGateBatch(s, fix,
            reup.unionByName(novel), maxHamming = 7,
            nBuckets = Dedup.hammingWideIndexBuckets(s, fix))
          .select("media_id")
      },
      Some(s"""$phashCte,
           |$phashWideCte,
           |${phashChainSql("n",
              "SELECT doc_id + 9000000 AS doc_id FROM documents WHERE doc_id % 7 = 3")},
           |${phashWideExtSql("n")},
           |arr AS (SELECT doc_id + 2000000 AS doc_id, dhash, vhash
           |  FROM phw WHERE doc_id % 7 = 0
           |  UNION ALL SELECT doc_id, dhash, vhash FROM nphw),
           |bc AS (${wideBandSlicesSql("phw", "dhash", 56, "vhash", 54, 7)}),
           |ba AS (${wideBandSlicesSql("arr", "dhash", 56, "vhash", 54, 7)}),
           |hits AS (SELECT DISTINCT a.doc_id FROM ba a JOIN bc c
           |  ON a.band = c.band AND a.key = c.key
           |  WHERE bit_count(xor(a.dhash, c.dhash))
           |    + bit_count(xor(a.vhash, c.vhash)) <= 7)
           |SELECT a.doc_id AS media_id FROM arr a
           |WHERE NOT EXISTS (SELECT 1 FROM hits h
           |  WHERE h.doc_id = a.doc_id)""".stripMargin)),

    // Streaming PERCEPTUAL AUDIO gate, batch parity: the audio member
    // of the gate family over the write-time WIDE audio-fingerprint
    // index — same arriving-batch construction as the image gate
    // (re-uploaded corpus clips under fresh ids rejected at hamming 0,
    // novel shifted-id groups accepted), same shared sink body; only
    // the signature kernel differs. The oracle replays the designed
    // E/D fingerprint chain for BOTH id domains from the one
    // parameterized definition, the shared band slicing, and the
    // NOT-EXISTS membership decision row-for-row.
    "llm_stream_audio_gate" -> Q(
      (s, dir) => {
        implicit val sp = s
        val fix = ensureAudioHashWideIndex(s, dir)
        val docs = Tables.documents(s, dir)
        val reup = Multimodal.syntheticAudioGroups(
            docs.filter(col("doc_id") % 7 === 0), "doc_id").toDF()
          .withColumn("media_id", col("media_id") + 2000000L)
        val novel = Multimodal.syntheticAudioGroups(
            docs.filter(col("doc_id") % 7 === 3)
              .select((col("doc_id") + 9000000L).as("doc_id")), "doc_id")
          .toDF()
        graft.streaming.Streams.audioGateBatch(s, fix,
            reup.unionByName(novel), maxHamming = 7,
            nBuckets = Dedup.hammingWideIndexBuckets(s, fix))
          .select("media_id")
      },
      Some(s"""$audioFpCte,
           |${audioFpChainSql("n",
              "SELECT doc_id + 9000000 AS doc_id FROM documents WHERE doc_id % 7 = 3")},
           |arr AS (SELECT doc_id + 2000000 AS doc_id, ehash, rhash
           |  FROM afp WHERE doc_id % 7 = 0
           |  UNION ALL SELECT doc_id, ehash, rhash FROM nafp),
           |bc AS (${wideBandSlicesSql("afp", "ehash", 56, "rhash", 54, 7)}),
           |ba AS (${wideBandSlicesSql("arr", "ehash", 56, "rhash", 54, 7)}),
           |hits AS (SELECT DISTINCT a.doc_id FROM ba a JOIN bc c
           |  ON a.band = c.band AND a.key = c.key
           |  WHERE bit_count(xor(a.ehash, c.ehash))
           |    + bit_count(xor(a.rhash, c.rhash)) <= 7)
           |SELECT a.doc_id AS media_id FROM arr a
           |WHERE NOT EXISTS (SELECT 1 FROM hits h
           |  WHERE h.doc_id = a.doc_id)""".stripMargin)),

    // Streaming PERCEPTUAL VIDEO gate, batch parity (round-17 — closes
    // the modality matrix: text/image/audio/video each now have a
    // streaming ingest gate). Membership is the strided frame-SET
    // decision over the write-time wide strided index: an arriving AVI
    // decodes to its k=3 strided frame signatures and is rejected when
    // ANY frame is within maxHamming of ANY corpus frame row — the
    // EXISTS reduction of Dedup.probeHammingWideIndexSet, so the
    // scrambled-first-frame re-encode evasion stays closed on the
    // ingest path (StreamsSpec drives exactly that scenario cross-batch
    // through MemoryStream: a member-scrambled duplicate of a video
    // accepted in the PREVIOUS batch is rejected through the appended
    // frame set). The arriving batch mixes RE-UPLOADS (corpus AVIs
    // under fresh ids — byte-identical payloads, all three strided
    // frames at hamming 0) with NOVEL videos (shifted-id groups whose
    // md5 salts are unseen — accepted). The oracle replays the
    // per-frame pixel→hash chain for BOTH id domains from the ONE
    // parameterized chain definition, the per-frame vertical words,
    // the shared wide band slicing over all (video, frame) rows, and
    // the NOT-EXISTS membership decision row-for-row.
    "llm_stream_video_gate" -> Q(
      (s, dir) => {
        implicit val sp = s
        val fix = ensureVideoStridedHashWideIndex(s, dir)
        val docs = Tables.documents(s, dir)
        val reup = Multimodal.syntheticVideoGroupsStrided(
            docs.filter(col("doc_id") % 7 === 0), "doc_id").toDF()
          .withColumn("media_id", col("media_id") + 2000000L)
        val novel = Multimodal.syntheticVideoGroupsStrided(
            docs.filter(col("doc_id") % 7 === 3)
              .select((col("doc_id") + 9000000L).as("doc_id")), "doc_id")
          .toDF()
        graft.streaming.Streams.videoGateBatch(s, fix,
            reup.unionByName(novel), maxHamming = 7,
            nBuckets = Dedup.hammingWideIndexBuckets(s, fix))
          .select("media_id")
      },
      Some(s"""$videoStridedPhashCte,
           |$videoStridedPhashWideCte,
           |${videoStridedChainSql("n",
              "SELECT doc_id + 9000000 AS doc_id FROM documents WHERE doc_id % 7 = 3")},
           |${videoStridedWideExtSql("n")},
           |arr AS (SELECT doc_id + 2000000 AS doc_id, f, dhash, vhash
           |  FROM vsphw WHERE doc_id % 7 = 0
           |  UNION ALL SELECT doc_id, f, dhash, vhash FROM nvsphw),
           |bc AS (${wideBandSlicesSql("vsphw", "dhash", 56, "vhash", 54, 7)}),
           |ba AS (${wideBandSlicesSql("arr", "dhash", 56, "vhash", 54, 7)}),
           |hits AS (SELECT DISTINCT a.doc_id FROM ba a JOIN bc c
           |  ON a.band = c.band AND a.key = c.key
           |  WHERE bit_count(xor(a.dhash, c.dhash))
           |    + bit_count(xor(a.vhash, c.vhash)) <= 7)
           |SELECT DISTINCT a.doc_id AS media_id FROM arr a
           |WHERE NOT EXISTS (SELECT 1 FROM hits h
           |  WHERE h.doc_id = a.doc_id)""".stripMargin)),

    // Streaming SEMANTIC gate, batch parity: the third gate of the
    // family — membership is embedding-cosine >= threshold against the
    // write-time LSH hyperplane index (Streams.semanticGateBatch =
    // probeLshThreshold + left-anti). The arriving batch mixes
    // positively-SCALED copies of corpus vectors (same direction =>
    // identical hyperplane buckets in every table, cosine exactly 1 =>
    // must be rejected; the surface-blind signal no lexical gate has)
    // with NEGATED vectors (all projection signs flip => different
    // buckets; accepted unless some bucket-mate scores <= -threshold).
    // The oracle replays the whole decision: bucket assignment is a
    // deterministic per-row function (projSql), cosine the pinned
    // double fold — so acceptance is recomputed row-for-row, not
    // contract-flagged. StreamsSpec drives the same dataflow through
    // MemoryStream incl. the cross-batch append and intra-batch check.
    // Streaming CROSS-MODAL PAIR gate, batch parity (round-18 — the
    // ingest-time form of llm_pair_contamination): an arriving
    // (caption, image) pair is rejected when its image perceptually
    // matches a corpus pair's image through the write-time wide image
    // index while its caption does NOT near-match that same pair's
    // caption through the write-time wide-simhash caption index —
    // contradictory supervision caught at the door instead of at
    // corpus-rebuild time. The pair corpus is every 4th document
    // (image group singletons, so decisions are about the arrival);
    // the arriving batch mixes CONTAMINATED re-uploads (corpus image
    // under the NEXT doc's caption — image hamming 0, captions
    // disagree: rejected), CONSISTENT re-uploads (corpus image under
    // its own caption — caption hamming 0 on the matched pair:
    // accepted; ordinary duplication is the dedup gates' job, not a
    // pair defect), and NOVEL pairs (unseen image group salts — no
    // image hit: accepted whatever the caption). Both membership
    // checks are the existing banded probes; the gate adds only the
    // per-(query, cand) anti-join. The oracle replays the full pixel
    // chain for corpus + both arriving image domains, BOTH wide-hash
    // chains (image dHash + caption simhash), the band candidacy
    // joins, and the anti-join decision row-for-row. StreamsSpec
    // drives the same dataflow through MemoryStream incl. cross-batch
    // index growth and the intra-batch keep-lowest-id check.
    "llm_stream_pair_gate" -> Q(
      (s, dir) => {
        implicit val sp = s
        val fixI = ensurePairImageIndex(s, dir)
        val fixC = ensurePairCaptionIndex(s, dir)
        val docs = Tables.documents(s, dir)
        val corp = docs.filter(col("doc_id") % 4 === 0)
        val contaminated = Multimodal.syntheticImageGroups(
            corp.filter(col("doc_id") % 7 === 0), "doc_id").toDF()
          .withColumn("media_id", col("media_id") + 2000000L)
          .join(docs.select((col("doc_id") - 1 + 2000000L).as("media_id"),
            col("text").as("caption")), Seq("media_id"))
        val consistent = Multimodal.syntheticImageGroups(
            corp.filter(col("doc_id") % 7 === 5), "doc_id").toDF()
          .withColumn("media_id", col("media_id") + 3000000L)
          .join(docs.select((col("doc_id") + 3000000L).as("media_id"),
            col("text").as("caption")), Seq("media_id"))
        val novel = Multimodal.syntheticImageGroups(
            corp.filter(col("doc_id") % 7 === 3)
              .select((col("doc_id") + 9000000L).as("doc_id")), "doc_id")
          .toDF()
          .join(docs.select((col("doc_id") + 9000000L).as("media_id"),
            col("text").as("caption")), Seq("media_id"))
        graft.streaming.Streams.pairGateBatch(s, fixI, fixC,
            contaminated.unionByName(consistent).unionByName(novel),
            "caption", maxHamming = 7, capMaxHamming = 7,
            nBuckets = Dedup.hammingWideIndexBuckets(s, fixI),
            capBuckets = Dedup.simhashWideIndexBuckets(s, fixC))
          .select("media_id")
      },
      Some(s"""WITH ${phashChainSql("gc",
              "SELECT doc_id FROM documents WHERE doc_id % 4 = 0")},
           |${phashWideExtSql("gc")},
           |${phashChainSql("gn",
              "SELECT doc_id + 9000000 AS doc_id FROM documents " +
                "WHERE doc_id % 4 = 0 AND doc_id % 7 = 3")},
           |${phashWideExtSql("gn")},
           |arrimg AS (
           |  SELECT doc_id + 2000000 AS doc_id, dhash, vhash FROM gcphw
           |    WHERE doc_id % 7 = 0
           |  UNION ALL SELECT doc_id + 3000000, dhash, vhash FROM gcphw
           |    WHERE doc_id % 7 = 5
           |  UNION ALL SELECT doc_id, dhash, vhash FROM gnphw),
           |arrcap AS (
           |  SELECT c.doc_id + 2000000 AS doc_id, d.text
           |  FROM documents c JOIN documents d ON d.doc_id = c.doc_id + 1
           |  WHERE c.doc_id % 4 = 0 AND c.doc_id % 7 = 0
           |  UNION ALL SELECT doc_id + 3000000, text FROM documents
           |    WHERE doc_id % 4 = 0 AND doc_id % 7 = 5
           |  UNION ALL SELECT doc_id + 9000000, text FROM documents
           |    WHERE doc_id % 4 = 0 AND doc_id % 7 = 3),
           |arr AS (SELECT i.doc_id, i.dhash, i.vhash, c.text
           |  FROM arrimg i JOIN arrcap c USING (doc_id)),
           |pcorpcap AS (SELECT doc_id, text FROM documents
           |  WHERE doc_id % 4 = 0),
           |${wideSigCte("pcorpcap", "gcth", "gcsim")},
           |${wideSigCte("arr", "gath", "gasim")},
           |bic AS (${wideBandSlicesSql("gcphw", "dhash", 56, "vhash", 54, 7)}),
           |bia AS (${wideBandSlicesSql("arr", "dhash", 56, "vhash", 54, 7)}),
           |imghits AS (SELECT DISTINCT a.doc_id AS query_id,
           |    c.doc_id AS cand_id
           |  FROM bia a JOIN bic c ON a.band = c.band AND a.key = c.key
           |  WHERE bit_count(xor(a.dhash, c.dhash))
           |    + bit_count(xor(a.vhash, c.vhash)) <= 7),
           |bcc AS (${wideBandsSql("gcsim")}),
           |bca AS (${wideBandsSql("gasim")}),
           |caphits AS (SELECT DISTINCT a.doc_id AS query_id,
           |    c.doc_id AS cand_id
           |  FROM bca a JOIN bcc c ON a.band = c.band AND a.key = c.key
           |  WHERE bit_count(xor(a.sh_lo, c.sh_lo))
           |    + bit_count(xor(a.sh_hi, c.sh_hi)) <= 7),
           |flagged AS (SELECT DISTINCT i.query_id FROM imghits i
           |  WHERE NOT EXISTS (SELECT 1 FROM caphits h
           |    WHERE h.query_id = i.query_id AND h.cand_id = i.cand_id))
           |SELECT a.doc_id AS media_id FROM arr a
           |WHERE NOT EXISTS (SELECT 1 FROM flagged f
           |  WHERE f.query_id = a.doc_id)""".stripMargin)),

    // BOTH defect directions of the streaming pair gate (round-19 —
    // pairGateBatch with rejectBoilerplate = true): contamination
    // (image matches a corpus pair, caption disagrees) AND its inverse,
    // caption BOILERPLATE (caption near-matches a corpus pair's
    // caption while the image does NOT match that pair's image — the
    // ingest-time CrossModal.captionBoilerplate: template alt-text
    // repeated over unrelated images). The arriving batch mixes
    // BOILERPLATE pairs (novel-salt image under a corpus pair's own
    // caption — caption hamming 0 on the pair, no image hit: rejected),
    // CONSISTENT re-uploads (corpus image under its own caption — the
    // caption hit and image hit align on the SAME cand, so neither
    // direction flags: accepted), and NOVEL pairs (unseen image salt
    // under a NON-corpus caption — the %4==1 neighbor doc's text:
    // accepted unless the oracle's recomputation finds an accidental
    // near-match, which it replays row-for-row). The oracle replays
    // the full pixel chain for corpus + both arriving salt domains,
    // both wide-hash chains, the band candidacy joins, and the
    // two-direction flag union. Decision function is pure in
    // (corpus-before-batch, batch): the gate's batch-domain exclusion
    // is invisible here (id domains disjoint) and is spec-tested in
    // StreamsSpec instead.
    "llm_stream_pair_gate_boilerplate" -> Q(
      (s, dir) => {
        implicit val sp = s
        val fixI = ensurePairImageIndex(s, dir)
        val fixC = ensurePairCaptionIndex(s, dir)
        val docs = Tables.documents(s, dir)
        val corp = docs.filter(col("doc_id") % 4 === 0)
        val boiler = Multimodal.syntheticImageGroups(
            corp.filter(col("doc_id") % 7 === 3)
              .select((col("doc_id") + 9000000L).as("doc_id")), "doc_id")
          .toDF()
          .join(docs.select((col("doc_id") + 9000000L).as("media_id"),
            col("text").as("caption")), Seq("media_id"))
        val consistent = Multimodal.syntheticImageGroups(
            corp.filter(col("doc_id") % 7 === 5), "doc_id").toDF()
          .withColumn("media_id", col("media_id") + 3000000L)
          .join(docs.select((col("doc_id") + 3000000L).as("media_id"),
            col("text").as("caption")), Seq("media_id"))
        val novel = Multimodal.syntheticImageGroups(
            corp.filter(col("doc_id") % 7 === 0)
              .select((col("doc_id") + 20000000L).as("doc_id")), "doc_id")
          .toDF()
          .join(docs.select((col("doc_id") - 1 + 20000000L).as("media_id"),
            col("text").as("caption")), Seq("media_id"))
        graft.streaming.Streams.pairGateBatch(s, fixI, fixC,
            boiler.unionByName(consistent).unionByName(novel),
            "caption", maxHamming = 7, capMaxHamming = 7,
            nBuckets = Dedup.hammingWideIndexBuckets(s, fixI),
            capBuckets = Dedup.simhashWideIndexBuckets(s, fixC),
            rejectBoilerplate = true)
          .select("media_id")
      },
      Some(s"""WITH ${phashChainSql("gc",
              "SELECT doc_id FROM documents WHERE doc_id % 4 = 0")},
           |${phashWideExtSql("gc")},
           |${phashChainSql("gn",
              "SELECT doc_id + 9000000 AS doc_id FROM documents " +
                "WHERE doc_id % 4 = 0 AND doc_id % 7 = 3")},
           |${phashWideExtSql("gn")},
           |${phashChainSql("gv",
              "SELECT doc_id + 20000000 AS doc_id FROM documents " +
                "WHERE doc_id % 4 = 0 AND doc_id % 7 = 0")},
           |${phashWideExtSql("gv")},
           |arrimg AS (
           |  SELECT doc_id, dhash, vhash FROM gnphw
           |  UNION ALL SELECT doc_id + 3000000, dhash, vhash FROM gcphw
           |    WHERE doc_id % 7 = 5
           |  UNION ALL SELECT doc_id, dhash, vhash FROM gvphw),
           |arrcap AS (
           |  SELECT doc_id + 9000000 AS doc_id, text FROM documents
           |    WHERE doc_id % 4 = 0 AND doc_id % 7 = 3
           |  UNION ALL SELECT doc_id + 3000000, text FROM documents
           |    WHERE doc_id % 4 = 0 AND doc_id % 7 = 5
           |  UNION ALL SELECT c.doc_id + 20000000, d.text
           |  FROM documents c JOIN documents d ON d.doc_id = c.doc_id + 1
           |  WHERE c.doc_id % 4 = 0 AND c.doc_id % 7 = 0),
           |arr AS (SELECT i.doc_id, i.dhash, i.vhash, c.text
           |  FROM arrimg i JOIN arrcap c USING (doc_id)),
           |pcorpcap AS (SELECT doc_id, text FROM documents
           |  WHERE doc_id % 4 = 0),
           |${wideSigCte("pcorpcap", "gcth", "gcsim")},
           |${wideSigCte("arr", "gath", "gasim")},
           |bic AS (${wideBandSlicesSql("gcphw", "dhash", 56, "vhash", 54, 7)}),
           |bia AS (${wideBandSlicesSql("arr", "dhash", 56, "vhash", 54, 7)}),
           |imghits AS (SELECT DISTINCT a.doc_id AS query_id,
           |    c.doc_id AS cand_id
           |  FROM bia a JOIN bic c ON a.band = c.band AND a.key = c.key
           |  WHERE bit_count(xor(a.dhash, c.dhash))
           |    + bit_count(xor(a.vhash, c.vhash)) <= 7),
           |bcc AS (${wideBandsSql("gcsim")}),
           |bca AS (${wideBandsSql("gasim")}),
           |caphits AS (SELECT DISTINCT a.doc_id AS query_id,
           |    c.doc_id AS cand_id
           |  FROM bca a JOIN bcc c ON a.band = c.band AND a.key = c.key
           |  WHERE bit_count(xor(a.sh_lo, c.sh_lo))
           |    + bit_count(xor(a.sh_hi, c.sh_hi)) <= 7),
           |flagged AS (
           |  SELECT DISTINCT i.query_id FROM imghits i
           |  WHERE NOT EXISTS (SELECT 1 FROM caphits h
           |    WHERE h.query_id = i.query_id AND h.cand_id = i.cand_id)
           |  UNION
           |  SELECT DISTINCT h.query_id FROM caphits h
           |  WHERE NOT EXISTS (SELECT 1 FROM imghits i
           |    WHERE i.query_id = h.query_id AND i.cand_id = h.cand_id))
           |SELECT a.doc_id AS media_id FROM arr a
           |WHERE NOT EXISTS (SELECT 1 FROM flagged f
           |  WHERE f.query_id = a.doc_id)""".stripMargin)),

    "llm_stream_semantic_gate" -> Q(
      (s, dir) => {
        // MULTI-PROBE POSTURE (round-18): the gate's membership layout
        // is the FIXED 4-table auto-plane index (ensureLshIndexMp —
        // index storage ×1, the write-amplification-safe end of the
        // recall trade at a corpus-sized growing index), probed with
        // the Hamming-1 expansion (probeTables = MultiProbeTables).
        // Width-targeted planes keep probe cost batch × targetWidth ×
        // tables × (p+1) at every corpus size (the round-16 fix); the
        // recall contract on this path is llm_lsh_multiprobe_recall
        // (1.0/1.0/0.9955 across three decades). The fixture's
        // designed decisions are posture-invariant: scaled copies have
        // cosine exactly 1, so they co-bucket in every table under ANY
        // plane count and any probe expansion.
        val fix = ensureLshIndexMp(s, dir)
        val planes = Similarity.lshIndexPlanes(s, fix)
        val tables = Similarity.lshIndexTables(s, fix)
        val emb = Tables.embeddings(s, dir)
        val arriving = emb.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 20000L).as("vec_id"),
            transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
          .unionByName(emb.filter(col("vec_id") % 5 === 2)
            .select((col("vec_id") + 30000L).as("vec_id"),
              transform(col("embedding"), x => -x).as("embedding")))
        graft.streaming.Streams.semanticGateBatch(s, fix, arriving,
          "vec_id", "embedding", threshold = 0.95, numPlanes = planes,
          numTables = tables,
          probeTables = Similarity.MultiProbeTables).select("vec_id")
      },
      Some {
        s"""$vecCte,
           |arriving AS (
           |  SELECT vec_id + 20000 AS vec_id,
           |    list_transform(v, x -> x * 2) AS v
           |  FROM v WHERE vec_id % 5 = 0
           |  UNION ALL
           |  SELECT vec_id + 30000 AS vec_id,
           |    list_transform(v, x -> -x) AS v
           |  FROM v WHERE vec_id % 5 = 2),
           |$lshAutoCtesMp,
           |cb AS (${lshAutoBucketsSql("v", "vec_id", "v")}),
           |ab AS (${lshAutoBucketsSql("arriving", "vec_id", "v")}),
           |abm AS (${lshMultiProbeSql("ab", "vec_id", "v")})
           |SELECT a.vec_id FROM arriving a
           |WHERE NOT EXISTS (SELECT 1 FROM abm JOIN cb
           |  ON abm.tbl = cb.tbl AND abm.bucket = cb.bucket
           |  WHERE abm.vec_id = a.vec_id
           |    AND ${cosSql("abm.v", "cb.v")} >= 0.95)""".stripMargin
      }),

    // RECALL CONTRACT for the auto-sized LSH gate (round-17): the
    // measured near-duplicate recall of the threshold probe against
    // BRUTE-FORCE ground truth, at the corpus-derived (planes, tables)
    // layout. The arriving set is every 3rd corpus vector ROTATED by
    // exactly acos(0.96) (the (7,24,25)/25 pair: qv = 0.96·v ⊕ 0.28·v⊥
    // in 32 coordinate planes — a true isometry, so cos(v, qv) = 0.96
    // for EVERY planted pair, safely inside the [0.95, 1) gate band
    // where recall genuinely depends on bucket collisions; scaled
    // cos=1 copies would trivially recall 1 at any layout). Ground
    // truth is the full brute cosine scan at 0.9; the probe is the
    // DPP-pruned index path the streaming gate runs
    // (Similarity.probeLshThreshold). recall_gate counts pairs at the
    // calibration threshold (cos ≥ 0.95), where lshTablesAuto's
    // planes→tables lookup analytically holds R ≥ 0.95 per decade —
    // under the round-16 fixed t=4 this number decays toward ~0.55 at
    // the p=16 clamp, which is exactly the silent-accept regression
    // this row makes LOUD (recall_ok flips to 0). The oracle replays
    // the rotation, the brute scan, the dynamic (planes, tables)
    // bucket assignment, and the membership cosine row-for-row.
    // Queries are capped at vec_id < 20000 so the brute truth stays
    // ~corpus × 6.7k pairs at every decade (covers ALL vectors at
    // fixture SFs — identical results there).
    "llm_lsh_recall_auto" -> Q(
      (s, dir) => lshRecallContract(s, dir, (fix, planes, tables, arriving) =>
        Similarity.probeLshThreshold(s, fix, arriving,
          "vec_id", "embedding", threshold = 0.9, numPlanes = planes,
          numTables = tables)),
      Some(lshRecallOracleSql(
        s"""hits AS (SELECT DISTINCT ab.vec_id AS query_id,
           |    cb.vec_id AS cand_id
           |  FROM ab JOIN cb ON ab.tbl = cb.tbl AND ab.bucket = cb.bucket
           |  WHERE ${cosSql("ab.v", "cb.v")} >= 0.9)""".stripMargin))),

    // MULTI-PROBE recall contract (round-17): the same rotated-pair /
    // brute-truth harness as llm_lsh_recall_auto, probing with
    // [[Similarity.probeLshThresholdMultiProbe]] — each query reads
    // its exact bucket PLUS every Hamming-1 neighbor in only the FIRST
    // FOUR tables of the auto layout. This is the storage-free half of
    // the recall story: at the p=16 clamp four exact-bucket tables
    // decay to ~0.55 recall at cos 0.95, the compensated layout holds
    // ≥0.95 by writing 15 tables (index ×3.75), and multi-probe holds
    // ~0.94 from the SAME four tables by widening each probe ×(p+1) —
    // probe latency traded for write amplification, both measured
    // decade-by-decade against identical brute-force truth. The oracle
    // replays the neighbor-bucket expansion (one plane-bit flip per
    // probe variant) inside the same static SQL skeleton.
    "llm_lsh_multiprobe_recall" -> Q(
      (s, dir) => lshRecallContract(s, dir, (fix, planes, tables, arriving) =>
        Similarity.probeLshThresholdMultiProbe(s, fix, arriving,
          "vec_id", "embedding", threshold = 0.9, numPlanes = planes,
          numTables = tables, probeTables = 4)),
      Some(lshRecallOracleSql(
        s"""abm AS (SELECT vec_id, v, tbl,
           |    CASE WHEN j = 0 THEN bucket
           |      ELSE xor(bucket, (CAST(1 AS BIGINT) << (j - 1))) END AS bucket
           |  FROM ab, (SELECT unnest(range(0,
           |      (SELECT pl FROM lpl) + 1)) AS j) jj
           |  WHERE tbl < 4),
           |hits AS (SELECT DISTINCT abm.vec_id AS query_id,
           |    cb.vec_id AS cand_id
           |  FROM abm JOIN cb ON abm.tbl = cb.tbl AND abm.bucket = cb.bucket
           |  WHERE ${cosSql("abm.v", "cb.v")} >= 0.9)""".stripMargin))),

    // COMPOSED streaming ingest pipeline, end-to-end batch parity: the
    // full seven-stage decision body of
    // [[graft.streaming.Streams.startIngestPipelineSink]] — redact ->
    // exact gate -> exact intra-batch self-dedup -> near-dup gate ->
    // near-dup intra pairs -> semantic gate -> semantic intra pairs ->
    // KN quality gate -> classifier gate — over ONE mixed arriving
    // batch, reported as the per-row rejection audit
    // (ingestPipelineTrace: doc_id, first rejecting stage, PII count).
    // The fixture plants one class per stage (doc_id % 11): perturbed
    // corpus copies (exact), same-normalized-text twins (exact_intra),
    // token-reversed corpus docs (near), same-bag twin pairs
    // (near_intra), direction-identical scaled vectors (semantic),
    // same-negated-vector pairs under different texts (semantic_intra),
    // suffixed-novel-token docs (kn), and truncated corpus halves whose
    // bigrams are all LM-seen (the only class that can reach clf /
    // accepted; a PII-suffixed twin proves redaction feeds the gates).
    // The oracle is a FULL replay of every stage: the redaction regex
    // chain, normalized-text corpus membership, the wide-simhash band
    // join (lossless at maxHamming=7 with 8 bands), LSH bucket-mate
    // cosine membership, the retrained KN-LM threshold decision, and
    // the retrained classifier logit — nothing contract-flagged.
    // StreamsSpec drives the same composition through MemoryStream
    // incl. cross-batch index growth and checkpoint restart.
    "llm_stream_ingest_e2e" -> Q(
      (s, dir) => {
        // Semantic stage on the MULTI-PROBE-POSTURE layout (round-18):
        // auto-sized planes (the round-16 fix for the fixed-4-plane
        // 85×-at-sf10 quadratic) over a FIXED 4-table layout probed
        // with the Hamming-1 expansion — the ingest path's membership
        // index GROWS with every accepted batch, so index storage ×1
        // (not the compensated t(p) tables) is the 100 TB posture;
        // recall is held by probe width instead
        // (llm_lsh_multiprobe_recall: 1.0/1.0/0.9955 per decade).
        // Designed semantic rejections (scaled copies, cos = 1) are
        // posture-invariant, so the fixture's class decisions are
        // unchanged at every SF.
        val semFix = ensureLshIndexMp(s, dir)
        val cfg = graft.streaming.Streams.IngestPipelineConfig(
          exactIndexPath = ensureExactDupIndex(s, dir),
          nearDupIndexPath = ensureSimhashWideIndex(s, dir),
          semIndexPath = semFix,
          lmPath = ensureKnLm(s, dir),
          clfModelPath = CurationQueries.ensureClfModel(s, dir),
          driftRefPath = ensureDriftRef(s, dir),
          nBucketsExact = 64, maxHamming = 7, semThreshold = 0.95,
          numPlanes = Similarity.lshIndexPlanes(s, semFix),
          numTables = Similarity.lshIndexTables(s, semFix),
          semProbeTables = Similarity.MultiProbeTables)
        graft.streaming.Streams.ingestPipelineTrace(s, cfg,
          ingestE2eArriving(s, dir), "doc_id", "text", "embedding")
      },
      Some(ingestE2eOracleSql)),

    // Near-dup CLUSTERS: MinHash-LSH pairs -> connected components -> one
    // cluster id (min member) per involved doc. The oracle replicates the
    // transitive closure with a recursive CTE.
    "llm_dedup_clusters" -> Q(
      (s, dir) => Dedup.dedupClusters(
        Dedup.minhashLshPairs(Tables.documents(s, dir),
          "doc_id", "text", shingleK = 3, bands = 8, rowsPerBand = 2,
          threshold = 0.5)),
      Some(s"""$clustersCteSql
           |SELECT doc_id, cluster_id FROM cl""".stripMargin)),

    // Leakage-safe split: near-dup clusters assigned to train/val/test
    // as UNITS (split key = cluster id; singletons by own id), so two
    // near-duplicates can never straddle train and test — the
    // eval-inflation pitfall of per-doc splitting on un-deduped corpora.
    "llm_cluster_split" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Curation.clusterSplit(docs.select(col("doc_id")),
          Dedup.dedupClusters(Dedup.minhashLshPairs(docs,
            "doc_id", "text", shingleK = 3, bands = 8, rowsPerBand = 2,
            threshold = 0.5)),
          "doc_id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
      },
      Some(s"""$clustersCteSql,
           |keyed AS (SELECT d.doc_id,
           |  coalesce(cl.cluster_id, d.doc_id) AS split_key
           |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id)
           |SELECT doc_id, split_key,
           |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM (SELECT doc_id, split_key,
           |  ${h60("CAST(split_key AS VARCHAR)")} % 100 AS b FROM keyed)""".stripMargin)),

    // Cluster-canonical selection: the KEEP decision of near-dup dedup —
    // per cluster, the best-quality member (ties -> smallest doc_id) via
    // the bounded-heap k=1 aggregate (no per-cluster sort; a mega-cluster
    // costs O(members) on the map side, one row per partition after).
    "llm_cluster_canonical" -> Q(
      (s, dir) => Dedup.clusterCanonical(
        Dedup.dedupClusters(
          Dedup.minhashLshPairs(Tables.documents(s, dir),
            "doc_id", "text", shingleK = 3, bands = 8, rowsPerBand = 2,
            threshold = 0.5)),
        qualityScored(s, dir), "doc_id", "quality"),
      Some(s"""$clustersCteSql,
           |qs AS ($qualitySigSql),
           |qscored AS (SELECT cl.cluster_id, cl.doc_id,
           |  $qualityExprSql AS quality
           |  FROM cl JOIN qs ON cl.doc_id = qs.doc_id),
           |ranked AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
           |    ORDER BY quality DESC, doc_id) AS rk,
           |  count(*) OVER (PARTITION BY cluster_id) AS nm FROM qscored)
           |SELECT cluster_id, doc_id AS canonical_doc,
           |  CAST(nm AS BIGINT) AS n_members, quality AS best_score
           |FROM ranked WHERE rk = 1""".stripMargin)),

    // Exact n-gram Jaccard similarity join (inverted-index candidates,
    // stop-shingle cap bounding the candidate blowup).
    "llm_dedup_ngram_jaccard" -> Q(
      (s, dir) => Dedup.ngramJaccardPairs(Tables.documents(s, dir),
        "doc_id", "text", shingleK = 3, threshold = 0.3, maxShingleDf = 100),
      Some(s"""$shCte,
         |inv AS (SELECT doc_id,
         |  unnest(list_transform(sh, x -> ${h60("x")})) AS s
         |  FROM sh),
         |kept AS (SELECT doc_id, s FROM
         |  (SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM inv)
         |  WHERE df <= 100),
         |sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY 1),
         |pairs AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
         |  count(*) AS inter
         |  FROM kept x JOIN kept y ON x.s = y.s AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  inter::DOUBLE / (a.n + b.n - inter)::DOUBLE AS jaccard
         |FROM pairs JOIN sizes a ON id_a = a.doc_id JOIN sizes b ON id_b = b.doc_id
         |WHERE inter::DOUBLE / (a.n + b.n - inter)::DOUBLE >= 0.3""".stripMargin)),

    // N-gram CONTAINMENT pairs: the corpus plus a 25-token excerpt of
    // every document — the quote-inclusion shape. Each excerpt scores
    // containment ~1.0 against its source while its Jaccard is ~25/len
    // (invisible to every Jaccard-thresholded family above), which is
    // exactly the asymmetric measure's job. Candidates come from the
    // same df-capped shared-gram index as the Jaccard join.
    "llm_containment" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val quotes = docs.select((col("doc_id") + 2000000L).as("doc_id"),
          concat_ws(" ",
            slice(graft.llm.TextOps.tokens(col("text")), 1, 25)).as("text"))
        Dedup.ngramContainmentPairs(docs.unionByName(quotes), "doc_id",
          "text", shingleK = 3, threshold = 0.8, maxShingleDf = 100)
      },
      Some(s"""WITH corpus AS (
         |  SELECT doc_id, ${toksSql("text")} AS ws FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2000000, (${toksSql("text")})[1:25] FROM documents),
         |shc AS (SELECT doc_id, ${shinglesSql("ws")} AS sh FROM corpus),
         |inv AS (SELECT doc_id,
         |  unnest(list_transform(sh, x -> ${h60("x")})) AS s FROM shc),
         |kept AS (SELECT doc_id, s FROM
         |  (SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM inv)
         |  WHERE df <= 100),
         |sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY 1),
         |pairs AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
         |  count(*) AS inter
         |  FROM kept x JOIN kept y ON x.s = y.s AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
         |  inter::DOUBLE / least(a.n, b.n)::DOUBLE AS containment
         |FROM pairs JOIN sizes a ON id_a = a.doc_id
         |JOIN sizes b ON id_b = b.doc_id
         |WHERE inter::DOUBLE / least(a.n, b.n)::DOUBLE >= 0.8""".stripMargin)),

    // Per-doc 60-bit SimHash signature (full bit-math parity check),
    // via the corpus-scale explode + vote-sum path.
    "llm_simhash" -> Q(
      (s, dir) => Dedup.simhashFrame(Tables.documents(s, dir), "doc_id", "text"),
      Some(s"""$simhashCte
         |SELECT doc_id, simhash FROM sim""".stripMargin)),

    // SimHash near-dup PAIRS (the dedup decision, not just the
    // signature): pigeonhole banding guarantees recall at hamming <= 8
    // (9 bands over 60 bits), true distance filters candidates.
    "llm_dedup_simhash_pairs" -> Q(
      (s, dir) => Dedup.simhashPairs(Tables.documents(s, dir),
        "doc_id", "text", maxHamming = 8),
      Some(s"""$simhashCte,
         |banded AS ($simhashBandsSql),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |  a.simhash AS sa, b.simhash AS sb
         |  FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 8""".stripMargin)),

    // Write-time SIMHASH index probed with a delta batch — the third
    // write-time dedup layout (beside the near-dup text index and the
    // embedding-LSH index): hamming probes become DPP-pruned reads with
    // the band value as the join residual and full signatures carried
    // in-index. Delta = doc_id < 50, same params as the pairs row.
    "llm_simhash_index_probe" -> Q(
      (s, dir) => {
        val fix = ensureSimhashIndex(s, dir)
        Dedup.probeSimhashIndex(s, fix,
          Tables.documents(s, dir).filter(col("doc_id") < 50),
          "doc_id", "text", maxHamming = 8, nBuckets = 32)
      },
      Some(s"""$simhashCte,
         |banded AS ($simhashBandsSql),
         |cand AS (SELECT DISTINCT q.doc_id AS query_id, c.doc_id AS cand_id,
         |  q.simhash AS qs, c.simhash AS cs
         |  FROM banded c JOIN banded q
         |  ON c.band = q.band AND c.key = q.key AND c.doc_id <> q.doc_id
         |  WHERE q.doc_id < 50)
         |SELECT query_id, cand_id,
         |  CAST(bit_count(xor(qs, cs)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(qs, cs)) <= 8""".stripMargin)),

    // WIDE (120-bit) simhash near-dup pairs: two independent 60-bit
    // words, pigeonhole over 8 x 15-bit bands, two-word bit_count(xor)
    // verify. The oracle replays both hash chains, the exact band
    // split, and the summed hamming decision — a divergence in either
    // word or in the band layout goes red.
    "llm_simhash_wide_pairs" -> Q(
      (s, dir) => Dedup.simhashWidePairs(Tables.documents(s, dir),
        "doc_id", "text", maxHamming = 7),
      Some(s"""$simhashWideCte,
         |banded AS ($simhashWideBandsSql),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |  a.sh_lo AS la, a.sh_hi AS ha, b.sh_lo AS lb, b.sh_hi AS hb
         |  FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS INT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 7""".stripMargin)),

    // Write-time WIDE-simhash index probed with a delta batch — the
    // simhash layout whose 15-bit band keys do NOT saturate the bucket
    // axis (auto-sized width here, resolved from the sidecar; the
    // family's 32768-value headroom vs the 60-bit family's 128-value
    // cap is measured in the round-10 DPP sweep in BASELINE.md).
    "llm_simhash_wide_index_probe" -> Q(
      (s, dir) => {
        val fix = ensureSimhashWideIndex(s, dir)
        Dedup.probeSimhashWideIndex(s, fix,
          Tables.documents(s, dir).filter(col("doc_id") < 50),
          "doc_id", "text", maxHamming = 7)
      },
      Some(s"""$simhashWideCte,
         |banded AS ($simhashWideBandsSql),
         |cand AS (SELECT DISTINCT q.doc_id AS query_id, c.doc_id AS cand_id,
         |  q.sh_lo AS ql, q.sh_hi AS qh, c.sh_lo AS cl, c.sh_hi AS ch
         |  FROM banded c JOIN banded q
         |  ON c.band = q.band AND c.key = q.key AND c.doc_id <> q.doc_id
         |  WHERE q.doc_id < 50)
         |SELECT query_id, cand_id,
         |  CAST(bit_count(xor(ql, cl)) + bit_count(xor(qh, ch)) AS INT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(ql, cl)) + bit_count(xor(qh, ch)) <= 7""".stripMargin)),

    // Embedding-cosine near-dup pairs, bucketed by the label column.
    "llm_dedup_embedding" -> Q(
      (s, dir) => Dedup.embeddingNearDupPairs(Tables.embeddings(s, dir),
        "vec_id", "embedding", "label", threshold = 0.35),
      Some(s"""$vecCte
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${cosSql("a.v", "b.v")} AS cos
         |FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.v", "b.v")} >= 0.35""".stripMargin)),

    // SEMANTIC dedup — the SemDeDup recipe (Dedup.semanticDedup):
    // k-means cells from the shared deterministic coarse quantizer,
    // within-cell cosine pairs closed into components, keep = component
    // minimum. KMeans cell boundaries aren't SQL-replicable, so the
    // oracle checks the CONTRACT the decision must satisfy (the IVF-row
    // pattern), each flag recomputed Spark-side from the raw vectors
    // via an INDEPENDENT pair pass over the materialized decision
    // frame: (a) a dropped member always has a same-cell witness
    // clearing the threshold, (b) no two KEPT members of one cell clear
    // it (exactly one representative per epsilon-group — a wrong
    // closure breaks this), (c) every member's representative is itself
    // kept, (d) one output row per corpus vector.
    "llm_semantic_dedup" -> Q(
      (s, dir) => semanticDedupContract(s, dir,
        Dedup.semanticDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
          nCells = 8, threshold = 0.4)),
      Some(semanticContractOracleSql)),

    // Semantic dedup as an INDEX CONSUMER: the cell assignment is read
    // from the write-time IVF layout (built once in warmup fixture prep,
    // like every other *_index row) instead of retrained per run — the
    // production shape once a coarse-quantizer artifact exists, and the
    // timed cost is the decision dataflow (per-cell pairs + closure +
    // contract), not a k-means fit. Same contract oracle; the flags are
    // recomputed from the index's own cells.
    "llm_semantic_dedup_index" -> Q(
      (s, dir) => semanticDedupContract(s, dir,
        Dedup.semanticDedupFromIvfIndex(s, ensureIvfIndex(s, dir),
          threshold = 0.4)),
      Some(semanticContractOracleSql)),

    // Substring-level exact dedup, stats edge: per-doc count/fraction of
    // k-gram occurrences (with multiplicity) that repeat ANYWHERE in the
    // corpus — the gram-granularity dedup measurement that catches shared
    // boilerplate inside otherwise-unique documents. One gram index
    // (hash-once in the scan stage), one map-side-combined count on the
    // gram hash, one equi-join back on the same key, one per-doc rollup.
    "llm_substring_dup" -> Q(
      (s, dir) => Dedup.substringDupStats(Tables.documents(s, dir),
        "doc_id", "text", k = 3),
      Some(s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
         |g AS (SELECT doc_id, ${gramsAllSql("ws")} AS gs FROM norm),
         |e AS (SELECT doc_id, unnest(list_transform(gs, s -> ${h60("s")})) AS h
         |      FROM g),
         |c AS (SELECT h, count(*) AS cnt FROM e GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS dup_frac
         |FROM e JOIN c USING (h) GROUP BY doc_id""".stripMargin)),

    // Substring-level exact dedup, removal edge: maximal duplicated-gram
    // runs per doc as [span_start, span_end] token intervals
    // (gap-and-islands over duplicated gram start positions; the only
    // window is per-doc over dup positions, never the corpus stream).
    "llm_substring_spans" -> Q(
      (s, dir) => Dedup.substringDupSpans(Tables.documents(s, dir),
        "doc_id", "text", k = 3),
      Some(s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
         |g AS (SELECT doc_id, ${gramsAllSql("ws")} AS gs FROM norm),
         |e AS (SELECT doc_id, CAST(unnest(range(0, len(gs))) AS INT) AS pos,
         |      unnest(list_transform(gs, s -> ${h60("s")})) AS h FROM g),
         |c AS (SELECT h, count(*) AS cnt FROM e GROUP BY 1),
         |d AS (SELECT doc_id, pos FROM e JOIN c USING (h) WHERE cnt > 1),
         |r AS (SELECT doc_id, pos, CAST(row_number() OVER
         |        (PARTITION BY doc_id ORDER BY pos) AS INT) AS rn FROM d)
         |SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
         |  CAST(max(pos) + 2 AS INT) AS span_end,
         |  CAST(count(*) AS BIGINT) AS n_grams
         |FROM r GROUP BY doc_id, pos - rn""".stripMargin)),

    // Corpus-unigram surprisal: per-token ln(total/count) pinned to
    // integer micro-nats BEFORE the per-doc sum (exact long arithmetic
    // cross-engine; the 1e-6 floor is the same ulp guard as the HLL
    // linear-counting branch), average derived per row.
    "llm_unigram_surprisal" -> Q(
      (s, dir) => TextAnalysis.unigramSurprisal(
        Tables.documents(s, dir), "doc_id", "text"),
      Some(s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
         |tk AS (SELECT doc_id, t FROM
         |  (SELECT doc_id, unnest(ws) AS t FROM norm) WHERE t <> ''),
         |c AS (SELECT t, CAST(count(*) AS DOUBLE) AS cnt FROM tk GROUP BY 1),
         |tot AS (SELECT sum(cnt) AS tot FROM c),
         |u AS (SELECT doc_id,
         |      CAST(floor(ln(tot / cnt) * 1e6 + 0.5) AS BIGINT) AS u
         |      FROM tk JOIN c USING (t) CROSS JOIN tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(u) AS BIGINT) AS sum_unats,
         |  CAST(sum(u) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6
         |    AS avg_surprisal
         |FROM u GROUP BY doc_id""".stripMargin)),

    // Bigram conditional surprisal: -ln p(w2|w1) averaged per doc, pinned
    // to integer micro-nats pre-sum. Pairs form in a narrow zip (no
    // window); the two count frames are vocab-cardinality.
    "llm_bigram_surprisal" -> Q(
      (s, dir) => TextAnalysis.bigramSurprisal(
        Tables.documents(s, dir), "doc_id", "text"),
      Some(s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
         |bg AS (SELECT doc_id,
         |    unnest(list_transform(range(1, len(ws)),
         |      i -> ws[i] || ' ' || ws[i+1])) AS bg
         |  FROM norm),
         |bgw AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1 FROM bg),
         |c12 AS (SELECT bg, CAST(count(*) AS DOUBLE) AS c12
         |  FROM bgw GROUP BY 1),
         |c1 AS (SELECT w1, CAST(count(*) AS DOUBLE) AS c1
         |  FROM bgw GROUP BY 1),
         |u AS (SELECT doc_id,
         |    CAST(floor(ln(c1 / c12) * 1e6 + 0.5) AS BIGINT) AS u
         |  FROM bgw JOIN c12 USING (bg) JOIN c1 USING (w1))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(u) AS BIGINT) AS sum_unats,
         |  CAST(sum(u) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6
         |    AS avg_bigram_surprisal
         |FROM u GROUP BY doc_id""".stripMargin)),

    // Interpolated Kneser–Ney bigram surprisal (the CCNet perplexity
    // filter): absolute discount 0.75 + continuation probability. The
    // p expression's parenthesization is replicated VERBATIM in the
    // oracle so both IEEE engines round identically; per-occurrence
    // surprisals pin to micro-nats before the per-doc sum.
    "llm_kn_surprisal" -> Q(
      (s, dir) => TextAnalysis.knBigramSurprisal(
        Tables.documents(s, dir), "doc_id", "text"),
      Some(s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
         |bg AS (SELECT doc_id,
         |    unnest(list_transform(range(1, len(ws)),
         |      i -> ws[i] || ' ' || ws[i+1])) AS bg
         |  FROM norm),
         |bgw AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1,
         |    split_part(bg, ' ', 2) AS w2 FROM bg),
         |c12 AS (SELECT bg, CAST(count(*) AS DOUBLE) AS c12
         |  FROM bgw GROUP BY 1),
         |c1s AS (SELECT w1, CAST(count(*) AS DOUBLE) AS c1,
         |    CAST(count(DISTINCT w2) AS DOUBLE) AS nfw FROM bgw GROUP BY 1),
         |cw AS (SELECT w2, CAST(count(DISTINCT w1) AS DOUBLE) AS ncw
         |  FROM bgw GROUP BY 1),
         |nb AS (SELECT CAST(count(*) AS DOUBLE) AS nbt FROM c12),
         |u AS (SELECT doc_id,
         |    CAST(floor(-ln(
         |      (greatest(c12 - 0.75, 0.0) + ((0.75 * nfw) * (ncw / nbt)))
         |        / c1) * 1e6 + 0.5) AS BIGINT) AS u
         |  FROM bgw JOIN c12 USING (bg) JOIN c1s USING (w1)
         |  JOIN cw USING (w2) CROSS JOIN nb)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(u) AS BIGINT) AS sum_unats,
         |  CAST(sum(u) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6
         |    AS avg_kn_surprisal
         |FROM u GROUP BY doc_id""".stripMargin)),

    // Streaming QUALITY gate (the CCNet perplexity filter, fourth gate):
    // arriving docs score against the FROZEN KN-LM artifact — intact
    // re-submissions (id%10==0) carry corpus-typical bigrams; token-
    // REVERSED twins (id%10==2) carry the same vocabulary in implausible
    // order. Accept = zero LM-unseen bigrams AND exact milli-unat avg
    // surprisal <= the artifact's stored corpus-mean threshold. The
    // oracle is a FULL replay (train + threshold + score are all
    // integer-exact), not contract flags.
    // The drift MONITOR stage (batch semantics of the seventh ingest
    // stage, startDriftMonitorSink): second-half events scored as
    // per-bin PSI against the FROZEN first-half reference artifact —
    // edges from the reference only, out-of-range arrivals clamped into
    // edge bins (vs dq_psi_drift's pooled global edges).
    "llm_stream_drift_monitor" -> Q(
      (s, dir) => {
        val fix = ensureDriftRef(s, dir)
        graft.ops.Checks.psiAgainstReference(s, fix,
          Tables.events(s, dir)
            .filter(!(col("ts") < lit("2024-01-16").cast("timestamp"))),
          "value")
      },
      Some("""WITH ref AS (SELECT CAST(value AS DOUBLE) AS v FROM events
             |  WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-01-16'),
             |b AS (SELECT min(v) AS lo, max(v) AS hi FROM ref),
             |rb AS (SELECT CASE WHEN hi > lo THEN
             |    CAST(least(greatest(floor((v - lo) / ((hi - lo) / 10)),
             |      0), 9) AS INT)
             |  ELSE 0 END AS bin FROM ref CROSS JOIN b),
             |rc AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_ref
             |  FROM rb GROUP BY 1),
             |arr AS (SELECT CAST(value AS DOUBLE) AS v FROM events
             |  WHERE value IS NOT NULL
             |    AND NOT (ts < TIMESTAMP '2024-01-16')),
             |ab AS (SELECT CASE WHEN hi > lo THEN
             |    CAST(least(greatest(floor((v - lo) / ((hi - lo) / 10)),
             |      0), 9) AS INT)
             |  ELSE 0 END AS bin FROM arr CROSS JOIN b),
             |ac AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_new
             |  FROM ab GROUP BY 1),
             |f AS (SELECT CAST(r.range AS INT) AS bin,
             |  coalesce(rc.n_ref, 0) AS n_ref, coalesce(ac.n_new, 0) AS n_new
             |  FROM range(10) r LEFT JOIN rc ON r.range = rc.bin
             |  LEFT JOIN ac ON r.range = ac.bin),
             |t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
             |  CAST(sum(n_new) AS BIGINT) AS tn FROM f)
             |SELECT bin, n_ref, n_new,
             |  CAST(floor((CAST(n_new + 1 AS DOUBLE) / CAST(tn + 10 AS DOUBLE)
             |    - CAST(n_ref + 1 AS DOUBLE) / CAST(tr + 10 AS DOUBLE))
             |   * ln((CAST(n_new + 1 AS DOUBLE) / CAST(tn + 10 AS DOUBLE))
             |     / (CAST(n_ref + 1 AS DOUBLE) / CAST(tr + 10 AS DOUBLE)))
             |   * 1e6 + 0.5) AS BIGINT) AS psi_micro
             |FROM f CROSS JOIN t""".stripMargin)),

    "llm_stream_quality_gate" -> Q(
      (s, dir) => {
        val fix = ensureKnLm(s, dir)
        val docs = Tables.documents(s, dir)
        val arriving = docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
          .unionByName(docs.filter(col("doc_id") % 10 === 2)
            .select((col("doc_id") + 4000000L).as("doc_id"),
              concat_ws(" ",
                reverse(graft.llm.TextOps.tokens(col("text")))).as("text")))
        TextAnalysis.knGateBatch(s, fix, arriving, "doc_id", "text")
          .select("doc_id")
      },
      Some(s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
         |bgc AS (SELECT doc_id,
         |    unnest(list_transform(range(1, len(ws)),
         |      i -> ws[i] || ' ' || ws[i+1])) AS bg
         |  FROM norm),
         |bgw AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1,
         |    split_part(bg, ' ', 2) AS w2 FROM bgc),
         |c12 AS MATERIALIZED (SELECT bg, CAST(count(*) AS DOUBLE) AS c12
         |  FROM bgw GROUP BY 1),
         |c1s AS MATERIALIZED (SELECT w1, CAST(count(*) AS DOUBLE) AS c1,
         |    CAST(count(DISTINCT w2) AS DOUBLE) AS nfw FROM bgw GROUP BY 1),
         |cw AS MATERIALIZED (SELECT w2, CAST(count(DISTINCT w1) AS DOUBLE)
         |    AS ncw FROM bgw GROUP BY 1),
         |nb AS (SELECT CAST(count(*) AS DOUBLE) AS nbt FROM c12),
         |tu AS (SELECT CAST(floor(-ln(
         |      (greatest(c12 - 0.75, 0.0) + ((0.75 * nfw) * (ncw / nbt)))
         |        / c1) * 1e6 + 0.5) AS BIGINT) AS u
         |  FROM bgw JOIN c12 USING (bg) JOIN c1s USING (w1)
         |  JOIN cw USING (w2) CROSS JOIN nb),
         |thr AS (SELECT (CAST(sum(u) AS BIGINT) * 1000) // count(*) AS thr
         |  FROM tu),
         |arr AS (SELECT doc_id + 3000000 AS doc_id, ws FROM norm
         |    WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id + 4000000, list_reverse(ws) FROM norm
         |    WHERE doc_id % 10 = 2),
         |abg AS (SELECT doc_id,
         |    unnest(list_transform(range(1, len(ws)),
         |      i -> ws[i] || ' ' || ws[i+1])) AS bg
         |  FROM arr),
         |abw AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1,
         |    split_part(bg, ' ', 2) AS w2 FROM abg),
         |sc AS (SELECT doc_id,
         |    sum(CASE WHEN c12 IS NULL THEN 1 ELSE 0 END) AS n_unseen,
         |    sum(CASE WHEN c12 IS NOT NULL THEN CAST(floor(-ln(
         |      (greatest(c12 - 0.75, 0.0) + ((0.75 * nfw) * (ncw / nbt)))
         |        / c1) * 1e6 + 0.5) AS BIGINT) END) AS su,
         |    count(*) AS nb
         |  FROM abw LEFT JOIN c12 USING (bg) LEFT JOIN c1s USING (w1)
         |  LEFT JOIN cw USING (w2) CROSS JOIN nb
         |  GROUP BY 1)
         |SELECT doc_id FROM sc CROSS JOIN thr
         |WHERE n_unseen = 0 AND su * 1000 <= thr * nb""".stripMargin)),

    // OOV rate against the deterministic top-100 corpus vocabulary —
    // the tokenizer-coverage check; the vocab side broadcasts.
    "llm_oov_rate" -> Q(
      (s, dir) => TextAnalysis.oovRate(
        Tables.documents(s, dir), "doc_id", "text", vocabK = 100),
      Some(s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
         |tk AS (SELECT doc_id, t FROM
         |  (SELECT doc_id, unnest(ws) AS t FROM norm) WHERE t <> ''),
         |v AS (SELECT t AS token FROM tk GROUP BY 1
         |      ORDER BY count(*) DESC, token LIMIT 100)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN t NOT IN (SELECT token FROM v)
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |  CAST(sum(CASE WHEN t NOT IN (SELECT token FROM v)
         |           THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS oov_rate
         |FROM tk GROUP BY doc_id""".stripMargin)),

    // Substring-level exact dedup, applied: cut the duplicated spans and
    // rebuild the cleaned text (string_agg ORDER BY pos == Spark's
    // sorted-collect concat). Fully-covered docs drop out on both sides.
    "llm_substring_clean" -> Q(
      (s, dir) => Dedup.substringClean(Tables.documents(s, dir),
        "doc_id", "text", k = 3),
      Some(s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
         |g AS (SELECT doc_id, ${gramsAllSql("ws")} AS gs FROM norm),
         |e AS (SELECT doc_id, CAST(unnest(range(0, len(gs))) AS INT) AS pos,
         |      unnest(list_transform(gs, s -> ${h60("s")})) AS h FROM g),
         |c AS (SELECT h, count(*) AS cnt FROM e GROUP BY 1),
         |d AS (SELECT doc_id, pos FROM e JOIN c USING (h) WHERE cnt > 1),
         |r AS (SELECT doc_id, pos, CAST(row_number() OVER
         |        (PARTITION BY doc_id ORDER BY pos) AS INT) AS rn FROM d),
         |spans AS (SELECT doc_id, min(pos) AS s0, max(pos) + 2 AS s1
         |          FROM r GROUP BY doc_id, pos - rn),
         |tk AS (SELECT doc_id, CAST(unnest(range(0, len(ws))) AS INT) AS pos,
         |       unnest(ws) AS t FROM norm),
         |kept AS (SELECT * FROM tk WHERE t <> '' AND NOT EXISTS
         |  (SELECT 1 FROM spans s WHERE s.doc_id = tk.doc_id
         |     AND tk.pos BETWEEN s.s0 AND s.s1))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |  string_agg(t, ' ' ORDER BY pos) AS clean_text
         |FROM kept GROUP BY doc_id""".stripMargin)),

    // Winnowing fingerprints (Schleimer et al.): min-hash of each
    // 4-gram window over the k=3 gram-hash stream, distinct per doc —
    // the complete candidate filter for verbatim overlaps of >= 6
    // tokens at ~2/5 the gram-index density.
    "llm_winnow" -> Q(
      (s, dir) => TextAnalysis.winnowFingerprints(Tables.documents(s, dir),
        "doc_id", "text", k = 3, window = 4),
      Some(s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
         |g AS (SELECT doc_id, ${gramsAllSql("ws")} AS gs FROM norm),
         |e AS (SELECT doc_id, CAST(unnest(range(0, len(gs))) AS INT) AS pos,
         |      unnest(list_transform(gs, s -> ${h60("s")})) AS h FROM g),
         |w AS (SELECT doc_id, min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp FROM e)
         |SELECT DISTINCT doc_id, fp FROM w""".stripMargin)),

    // Winnow candidate pairs (the MOSS composition): docs sharing >= 2
    // selected fingerprints, with the shared count — the near-copy
    // candidate set at fingerprint density instead of gram density. The
    // self-join key is the fingerprint (real-overlap selective), never
    // the doc pair space.
    "llm_winnow_pairs" -> Q(
      (s, dir) => {
        val fp = TextAnalysis.winnowFingerprints(Tables.documents(s, dir),
          "doc_id", "text", k = 3, window = 4)
        fp.select(col("doc_id").as("id_a"), col("fp"))
          .join(fp.select(col("doc_id").as("id_b"), col("fp")), Seq("fp"))
          .filter(col("id_a") < col("id_b"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("shared_fp"))
          .filter(col("shared_fp") >= 2)
      },
      Some(s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
         |g AS (SELECT doc_id, ${gramsAllSql("ws")} AS gs FROM norm),
         |e AS (SELECT doc_id, CAST(unnest(range(0, len(gs))) AS INT) AS pos,
         |      unnest(list_transform(gs, s -> ${h60("s")})) AS h FROM g),
         |w AS (SELECT doc_id, min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp FROM e),
         |f AS (SELECT DISTINCT doc_id, fp FROM w)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(count(*) AS BIGINT) AS shared_fp
         |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin)),

    // Exact bag-of-words cosine pairs over the inverted token index:
    // every cross-row sum is an INTEGER (tf dot products / squared
    // norms), so the full double cosine hash-matches; stop-tokens
    // (df > 100) dropped before the self-join (the pair-blowup guard).
    "llm_tf_cosine" -> Q(
      (s, dir) => TextAnalysis.tfCosinePairs(Tables.documents(s, dir),
        "doc_id", "text", threshold = 0.3, maxTokenDf = 100),
      Some(s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
         |tok AS (SELECT doc_id, ${h60("t")} AS h,
         |        CAST(count(*) AS BIGINT) AS tf
         |        FROM (SELECT doc_id, unnest(ws) AS t FROM norm)
         |        WHERE t <> '' GROUP BY 1, 2),
         |stop AS (SELECT h FROM (SELECT h, count(*) AS df FROM tok GROUP BY 1)
         |         WHERE df > 100),
         |kept AS (SELECT * FROM tok WHERE h NOT IN (SELECT h FROM stop)),
         |norms AS (SELECT doc_id, sum(tf * tf) AS nsq FROM kept GROUP BY 1),
         |dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         sum(a.tf * b.tf) AS dot
         |         FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
         |         GROUP BY 1, 2)
         |SELECT id_a, id_b, CAST(dot AS DOUBLE) /
         |  (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cos
         |FROM dots JOIN norms na ON id_a = na.doc_id
         |JOIN norms nb ON id_b = nb.doc_id
         |WHERE CAST(dot AS DOUBLE) /
         |  (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) >= 0.3
         |""".stripMargin)),

    // Unit-normalization of the embedding corpus: the pre-ANN step that
    // turns cosine into a plain dot product. Per-element division is an
    // exactly-rounded IEEE op, so every component hash-matches. The query
    // edge posexplodes the unit vector into scalar (vec_id, norm, pos,
    // value) rows — the driver's oracle comparator sorts cell values, and
    // an array-typed cell is unsortable there; scalar rows also verify
    // MORE (per-element equality, not whole-array stringification).
    "llm_normalize" -> Q(
      (s, dir) => Similarity.normalize(
          Tables.embeddings(s, dir), "vec_id", "embedding")
        .select(col("vec_id"), col("norm"),
          posexplode(col("unit")).as(Seq("pos", "value"))),
      Some(s"""$vecCte
              |SELECT vec_id, sqrt(${dotSql("v", "v")}) AS norm,
              |CAST(unnest(range(0, len(v))) AS INT) AS pos,
              |unnest(list_transform(v, x -> x / sqrt(${dotSql("v", "v")}))) AS value
              |FROM v""".stripMargin)),

    // Per-dimension min-max feature scaling: order-independent (min/max,
    // not sums) so the full double output hash-matches. The stats frame
    // is dimension-cardinality (64 rows) and broadcasts at any corpus
    // size.
    "llm_minmax_scale" -> Q(
      (s, dir) => Similarity.minMaxScaleDims(
        Tables.embeddings(s, dir), "vec_id", "embedding"),
      Some(s"""$vecCte,
              |dims AS (SELECT vec_id,
              |  CAST(unnest(range(0, len(v))) AS INT) AS pos,
              |  unnest(v) AS x FROM v),
              |stats AS (SELECT pos, min(x) AS lo, max(x) AS hi
              |  FROM dims GROUP BY 1)
              |SELECT vec_id, pos,
              |  CASE WHEN hi > lo THEN (x - lo) / (hi - lo)
              |       ELSE 0.0 END AS scaled
              |FROM dims JOIN stats USING (pos)""".stripMargin)),

    // Z-score standardization per dimension — the portably-exact-moment
    // variant: micro-unit-pinned decimal sums are order-independent, so
    // the derived mean/std (and therefore every z value) hash-match the
    // oracle at full double precision.
    "llm_zscore_scale" -> Q(
      (s, dir) => Similarity.zscoreScaleDims(
        Tables.embeddings(s, dir), "vec_id", "embedding"),
      Some(s"""$vecCte,
              |dims AS (SELECT vec_id,
              |  CAST(unnest(range(0, len(v))) AS INT) AS pos,
              |  unnest(v) AS x FROM v),
              |di AS (SELECT vec_id, pos, x,
              |  CAST(round(x * 1e6) AS DECIMAL(18,0)) AS xi FROM dims),
              |stats AS (SELECT pos, CAST(count(*) AS DOUBLE) AS n,
              |  CAST(sum(xi) AS DOUBLE) AS m1,
              |  CAST(sum(xi * xi) AS DOUBLE) AS m2 FROM di GROUP BY 1),
              |st AS (SELECT pos, m1 / n / 1e6 AS mean,
              |  (m2 - m1 * m1 / n) / n / 1e12 AS varr FROM stats)
              |SELECT vec_id, pos,
              |  CASE WHEN varr > 0 THEN (x - mean) / sqrt(varr)
              |       ELSE 0.0 END AS z
              |FROM di JOIN st USING (pos)""".stripMargin)),

    // Cross-source shingle-overlap matrix: shared distinct 3-grams and
    // Jaccard per source pair — the between-dataset duplication audit.
    // Reduces to distinct (source, hash) FIRST; self-join on the 8-byte
    // hash; all 190 pairs kept (zero-overlap rows included).
    "llm_source_overlap" -> Q(
      (s, dir) => Dedup.sourceOverlap(
        Tables.documents(s, dir), "source", "text", shingleK = 3),
      Some(s"""WITH sh AS (SELECT DISTINCT src, h FROM (
         |  SELECT source AS src, ${h60("s0")} AS h FROM (
         |    SELECT source, unnest(${shinglesSql("ws")}) AS s0 FROM (
         |      SELECT source, ${toksSql("text")} AS ws FROM documents)))),
         |sizes AS (SELECT src, CAST(count(*) AS BIGINT) AS n
         |  FROM sh GROUP BY 1),
         |inter AS (SELECT a.src AS source_a, b.src AS source_b,
         |  CAST(count(*) AS BIGINT) AS n_common
         |  FROM sh a JOIN sh b ON a.h = b.h AND a.src < b.src
         |  GROUP BY 1, 2),
         |pairs AS (SELECT a.src AS source_a, b.src AS source_b,
         |  a.n AS n_a, b.n AS n_b
         |  FROM sizes a JOIN sizes b ON a.src < b.src)
         |SELECT p.source_a, p.source_b,
         |  CAST(coalesce(i.n_common, 0) AS BIGINT) AS n_common,
         |  CAST(coalesce(i.n_common, 0) AS DOUBLE) /
         |    (p.n_a + p.n_b - coalesce(i.n_common, 0)) AS jaccard
         |FROM pairs p LEFT JOIN inter i USING (source_a, source_b)""".stripMargin)),

    // Global symmetric int8 scalar quantization (SQ8) of the unit-
    // normalized corpus: the ANN memory layout (8x smaller than the
    // double vectors the scorer would otherwise shuffle). Codes are pure
    // ints, so the hash check is unconditional.
    "llm_quantize_int8" -> Q(
      (s, dir) => {
        val unit = Similarity.normalize(
          Tables.embeddings(s, dir), "vec_id", "embedding")
        Similarity.quantizeInt8(unit, "vec_id", "unit")
          .select(col("vec_id"), posexplode(col("codes")).as(Seq("pos", "code")))
      },
      Some(s"""$sq8Cte
              |SELECT vec_id, CAST(unnest(range(0, len(u))) AS INT) AS pos,
              |  unnest(list_transform(u,
              |    x -> CAST(round(x * 127.0 / gmax) AS INT))) AS code
              |FROM u, g""".stripMargin)),

    // SQ8 approximate top-k: candidates ranked by the EXACT integer dot
    // product of int8 code vectors (codegen'd graft_dot_int) — the
    // quantized scoring hot loop that replaces float cosine at scale.
    "llm_sim_topk_sq8" -> Q(
      (s, dir) => Similarity.sq8TopK(Tables.embeddings(s, dir),
        "vec_id", "embedding", col("vec_id") < 10, k = 5),
      Some(s"""$sq8Cte,
         |codes AS (SELECT vec_id, list_transform(u,
         |    x -> CAST(round(x * 127.0 / gmax) AS INT)) AS cd
         |  FROM u, g),
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |  CAST(${intDotSql("q.cd", "c.cd")} AS DOUBLE) AS cos
         |  FROM codes c JOIN codes q ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 10),
         |ranked AS (SELECT *, CAST(row_number() OVER
         |  (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS INT) AS rank
         |  FROM scored)
         |SELECT query_id, cand_id, cos, rank FROM ranked WHERE rank <= 5""".stripMargin)),

    // Two-stage ANN: SQ8 integer-dot shortlist (4x oversampled), exact
    // float cosine re-rank of the shortlist only — the production
    // quantized-scan/exact-rerank layout. Full-precision vectors are
    // joined in at shortlist cardinality, never scanned corpus-wide.
    "llm_sim_topk_sq8_rerank" -> Q(
      (s, dir) => Similarity.sq8RerankTopK(Tables.embeddings(s, dir),
        "vec_id", "embedding", col("vec_id") < 10, k = 5, oversample = 4),
      Some(s"""$sq8Cte,
         |codes AS (SELECT vec_id, list_transform(u,
         |    x -> CAST(round(x * 127.0 / gmax) AS INT)) AS cd
         |  FROM u, g),
         |qscored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |  ${intDotSql("q.cd", "c.cd")} AS score
         |  FROM codes c JOIN codes q ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 10),
         |short AS (SELECT query_id, cand_id FROM
         |  (SELECT query_id, cand_id, row_number() OVER (PARTITION BY query_id
         |     ORDER BY score DESC, cand_id) AS rank FROM qscored)
         |  WHERE rank <= 20),
         |rer AS (SELECT s.query_id, s.cand_id, ${cosSql("q.v", "c.v")} AS cos
         |  FROM short s JOIN v c ON c.vec_id = s.cand_id
         |  JOIN v q ON q.vec_id = s.query_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |  ORDER BY cos DESC, cand_id) AS INT) AS rank FROM rer)
         |SELECT query_id, cand_id, cos, rank FROM ranked WHERE rank <= 5""".stripMargin)),

    // Product quantization (IVF-PQ's code path): 8 subspace codebooks of
    // 16 codewords over the unit-normalized 64-dim embeddings — codes
    // are 8 small ints per vector, the corpus-wide ADC scan reads ONLY
    // them (reconstruct-then-dot against the broadcast codebook
    // literals), and the exact cosine re-ranks the 4x-oversampled
    // shortlist. KMeans codebooks aren't SQL-replicable, so the oracle
    // is the pinned contract row (the IVF pattern): k returned, heap
    // order intact, reported cos bit-equal to the pinned recompute,
    // recall floor vs brute force cleared.
    "llm_sim_topk_pq" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") < 10)
        val approx = Similarity.pqRerankTopK(emb, "vec_id", "embedding",
          col("vec_id") < 10, k = 5, m = 8, codebookK = 16, oversample = 4)
          .transform(Materialize.pin)
        Similarity.annContract(approx,
          Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5),
          emb, "vec_id", "embedding", k = 5, recallFloor = 0.2)
      },
      Some("""SELECT DISTINCT vec_id AS query_id, CAST(5 AS INT) AS k_returned,
             |CAST(1 AS INT) AS cos_monotone_ok, CAST(1 AS INT) AS cos_exact_ok,
             |CAST(1 AS INT) AS recall_floor_ok
             |FROM embeddings WHERE vec_id < 10""".stripMargin)),

    // IVF-PQ write-time index, grown by append: coarse cells + subspace
    // codebooks trained on HALF the corpus (even ids), the other half
    // assigned + encoded against the frozen artifacts and appended —
    // then probed: DPP-pruned read of nProbe cell directories, ADC over
    // the m-int code column only, exact rerank from the base table.
    // The contract row holds over the FULL corpus ground truth, so it
    // certifies the grown index answers for rows the training never saw.
    "llm_sim_topk_pq_index" -> Q(
      (s, dir) => {
        val fix = ensureGrownIvfPqIndex(s, dir)
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") < 10)
        Similarity.annContract(
          Similarity.ivfPqTopKFromIndex(s, fix, emb, "vec_id", "embedding",
            col("vec_id") < 10, k = 5, nProbe = 5, oversample = 8),
          Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5),
          emb, "vec_id", "embedding", k = 5, recallFloor = 0.2)
      },
      Some("""SELECT DISTINCT vec_id AS query_id, CAST(5 AS INT) AS k_returned,
             |CAST(1 AS INT) AS cos_monotone_ok, CAST(1 AS INT) AS cos_exact_ok,
             |CAST(1 AS INT) AS recall_floor_ok
             |FROM embeddings WHERE vec_id < 10""".stripMargin)),

    // SQ8 quality: per-query recall@5 of the quantized ranking against
    // the float brute-force ground truth — how much cosine fidelity the
    // 8x memory saving costs on this corpus.
    "llm_sq8_recall" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.recallAtK(
          Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5),
          Similarity.sq8TopK(emb, "vec_id", "embedding",
            col("vec_id") < 10, k = 5),
          k = 5)
      },
      Some(s"""$sq8Cte,
         |fscored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |  ${cosSql("q.v", "c.v")} AS cos
         |  FROM v c JOIN v q ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 10),
         |exact AS (SELECT query_id, cand_id FROM
         |  (SELECT query_id, cand_id, row_number() OVER (PARTITION BY query_id
         |     ORDER BY cos DESC, cand_id) AS rank FROM fscored)
         |  WHERE rank <= 5),
         |codes AS (SELECT vec_id, list_transform(u,
         |    x -> CAST(round(x * 127.0 / gmax) AS INT)) AS cd
         |  FROM u, g),
         |qscored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |  ${intDotSql("q.cd", "c.cd")} AS score
         |  FROM codes c JOIN codes q ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 10),
         |approx AS (SELECT query_id, cand_id FROM
         |  (SELECT query_id, cand_id, row_number() OVER (PARTITION BY query_id
         |     ORDER BY score DESC, cand_id) AS rank FROM qscored)
         |  WHERE rank <= 5),
         |hits AS (SELECT e.query_id, count(*) AS n_hits
         |  FROM exact e JOIN approx a
         |  ON e.query_id = a.query_id AND e.cand_id = a.cand_id
         |  GROUP BY 1)
         |SELECT q.query_id,
         |  CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 5 AS recall
         |FROM (SELECT DISTINCT query_id FROM exact) q
         |LEFT JOIN hits h ON q.query_id = h.query_id""".stripMargin)),

    // Nearest-centroid classification: micro-unit-pinned exact centroid
    // sums (labels x dims rows — broadcast at any corpus size), one scan
    // to score, heap-agg argmax. The embedding-space label-quality audit.
    "llm_centroid_classify" -> Q(
      (s, dir) => Similarity.centroidClassify(
        Tables.embeddings(s, dir), "vec_id", "embedding", "label"),
      Some(s"""WITH m AS (SELECT vec_id, label,
         |  list_transform(embedding,
         |    x -> CAST(round(x::DOUBLE * 1000000.0) AS BIGINT)) AS mv
         |  FROM embeddings),
         |dims AS (SELECT label AS c_label,
         |  CAST(unnest(range(0, len(mv))) AS INT) AS pos, unnest(mv) AS mm
         |  FROM m),
         |sums AS (SELECT c_label, pos, sum(mm) AS sm FROM dims GROUP BY 1, 2),
         |cent AS (SELECT c_label, list(CAST(sm AS DOUBLE) ORDER BY pos) AS cs
         |  FROM sums GROUP BY 1),
         |mvd AS (SELECT vec_id, label,
         |  list_transform(mv, x -> CAST(x AS DOUBLE)) AS qv FROM m),
         |scored AS (SELECT vec_id, label, c_label,
         |  ${dotSql("qv", "cs")} / sqrt(${dotSql("cs", "cs")}) AS score
         |  FROM mvd, cent),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |  ORDER BY score DESC, c_label) AS rk FROM scored)
         |SELECT vec_id, label, c_label AS pred_label,
         |  CAST(label = c_label AS INT) AS correct
         |FROM ranked WHERE rk = 1""".stripMargin)),

    // ANN evaluation: per-query recall@5 of the LSH index against the
    // brute-force ground truth — the tuning loop for numPlanes/numTables.
    // The oracle composes the brute + LSH twins (both independently
    // hash-verified below) with the semi-join recall computation.
    "llm_ann_recall" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") < 10)
        Similarity.recallAtK(
          Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5),
          Similarity.lshTopK(emb, q, "vec_id", "embedding", k = 5,
            numPlanes = 4, numTables = 4),
          k = 5)
      },
      Some {
        val bucket = (v: String, t: Int) => (0 until 4).map(p =>
          s"(CASE WHEN ${projSql(v, t * 4 + p)} >= 0 THEN ${1L << p} ELSE 0 END)")
          .mkString("(", " + ", ")::BIGINT")
        val bv = (0 until 4).map(t =>
          s"SELECT vec_id, v, $t AS tbl, ${bucket("v", t)} AS bucket FROM v")
          .mkString("\nUNION ALL\n")
        s"""$vecCte,
           |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           |  ${cosSql("q.v", "c.v")} AS cos
           |  FROM v c JOIN v q ON c.vec_id <> q.vec_id
           |  WHERE q.vec_id < 10),
           |exact AS (SELECT query_id, cand_id FROM
           |  (SELECT query_id, cand_id, row_number() OVER (PARTITION BY query_id
           |     ORDER BY cos DESC, cand_id) AS rank FROM scored)
           |  WHERE rank <= 5),
           |bv AS ($bv),
           |hot AS (SELECT tbl, bucket FROM bv GROUP BY tbl, bucket
           |  HAVING count(*) > ${graft.llm.Similarity.DefaultMaxBucketWidth}),
           |cand AS (SELECT DISTINCT q.vec_id AS query_id, q.v AS qv,
           |  c.vec_id AS cand_id, c.v AS cv
           |  FROM bv c JOIN bv q
           |  ON c.tbl = q.tbl AND c.bucket = q.bucket AND c.vec_id <> q.vec_id
           |  WHERE q.vec_id < 10 AND NOT EXISTS (SELECT 1 FROM hot h
           |    WHERE h.tbl = c.tbl AND h.bucket = c.bucket)),
           |approx AS (SELECT query_id, cand_id FROM
           |  (SELECT query_id, cand_id, row_number() OVER (PARTITION BY query_id
           |     ORDER BY ${cosSql("qv", "cv")} DESC, cand_id) AS rank FROM cand)
           |  WHERE rank <= 5),
           |hits AS (SELECT e.query_id, count(*) AS n_hits
           |  FROM exact e JOIN approx a
           |  ON e.query_id = a.query_id AND e.cand_id = a.cand_id
           |  GROUP BY 1)
           |SELECT q.query_id,
           |  CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 5 AS recall
           |FROM (SELECT DISTINCT query_id FROM exact) q
           |LEFT JOIN hits h ON q.query_id = h.query_id""".stripMargin
      }),

    // Brute-force cosine top-k: 10 query vectors vs the full corpus, k=5.
    "llm_sim_topk_brute" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5)
      },
      Some(s"""$vecCte,
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |  ${cosSql("q.v", "c.v")} AS cos
         |  FROM v c JOIN v q ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 10),
         |ranked AS (SELECT *, CAST(row_number() OVER
         |  (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS INT) AS rank
         |  FROM scored)
         |SELECT query_id, cand_id, cos, rank FROM ranked WHERE rank <= 5""".stripMargin)),

    // Radius (range) similarity search: every non-self pair at cosine
    // >= 0.25 for the 10-query batch — the result-size-unbounded
    // complement of top-k, sharing the same pinned brute scoring scan,
    // so the oracle is exact (no contract rows needed).
    "llm_sim_range" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.rangeSearch(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", minCos = 0.25)
      },
      Some(s"""$vecCte,
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |  ${cosSql("q.v", "c.v")} AS cos
         |  FROM v c JOIN v q ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 10)
         |SELECT query_id, cand_id, cos FROM scored
         |WHERE cos >= 0.25""".stripMargin)),

    // Hard-negative mining: per query, the 5 MOST similar vectors that
    // are neither self nor a known positive — anti-joined BEFORE
    // ranking, so a positive can never crowd a real negative out of the
    // top-k (the contrastive complement of uniform negativeSample).
    // Positives are the (id, id+1) adjacency.
    "llm_hard_negatives" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10),
          emb.select(col("vec_id"), (col("vec_id") + 1).as("pos_id")),
          "vec_id", "embedding", k = 5)
      },
      Some(s"""$vecCte,
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |  ${cosSql("q.v", "c.v")} AS cos
         |  FROM v c JOIN v q ON c.vec_id <> q.vec_id
         |    AND c.vec_id <> q.vec_id + 1
         |  WHERE q.vec_id < 10),
         |ranked AS (SELECT *, CAST(row_number() OVER
         |  (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS INT) AS rank
         |  FROM scored)
         |SELECT query_id, cand_id, cos, rank FROM ranked WHERE rank <= 5""".stripMargin)),

    // Multi-table LSH approximate top-k: 4 tables x 4 deterministic
    // hyperplanes; candidates = bucket-mates in any table, deduped, then
    // exact-cosine scored and ranked.
    "llm_sim_topk_lsh" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, numPlanes = 4, numTables = 4)
      },
      Some(lshTopK5OracleSql)),

    // The write-time LSH index layout probed with partition pruning: the
    // corpus is materialized once (tbl, bucket)-partitioned, and the
    // probe's scan reads ONLY the bucket directories the queries hash
    // into (dynamic partition pruning; plan-asserted in SimilaritySpec).
    // Same oracle as llm_sim_topk_lsh — the layouts must agree exactly.
    "llm_sim_topk_lsh_index" -> Q(
      (s, dir) => {
        // Cache key = CONTENT fingerprint of the source parquet (names,
        // sizes, mtimes), not just the sanitized dir string: a regenerated
        // dataset gets a fresh index instead of a silently stale one, and
        // distinct dirs that sanitize alike cannot collide. The build runs
        // at most once per content (usually during Bench warmup).
        val fix = ensureLshIndex(s, dir)
        val emb = Tables.embeddings(s, dir)
        Similarity.lshTopKFromIndex(s, fix, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, numPlanes = 4, numTables = 4)
      },
      Some(lshTopK5OracleSql)),

    // INCREMENTAL index maintenance, end-to-end: the index is built from
    // half the corpus and GROWN by appending the other half
    // (Similarity.appendToLshIndex) — bucket assignment is a pure
    // per-row function, so probing the grown layout must return exactly
    // the rows of a from-scratch index (and of the inline path): all
    // three share one oracle. The 100 TB story: daily ingests append
    // partitions, nothing is rewritten, probes are unchanged.
    "llm_sim_topk_lsh_grown" -> Q(
      (s, dir) => {
        val fix = ensureGrownLshIndex(s, dir)
        val emb = Tables.embeddings(s, dir)
        Similarity.lshTopKFromIndex(s, fix, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, numPlanes = 4, numTables = 4)
      },
      Some(lshTopK5OracleSql)),

    // IVF approximate top-k: k-means coarse cells (seeded - deterministic
    // per environment, but not SQL-replicable), so the registered row is
    // the CONTRACT of the result rather than the rows themselves
    // (Similarity.annContract): per query, k rows returned, cos monotone
    // along rank, every cos bit-equal to the recomputed cosine, recall
    // vs brute force over the floor, and the inline result identical to
    // the write-time index probe. Each flag's expected value is knowable
    // without replicating KMeans, so the row hash-checks end to end.
    // Floor 0.2: recall@5 is 0.2-quantized; measured per-query minimum at
    // nProbe=3 is 0.2 (sf0.001/0.01) and 0.4 (sf0.1) on the seeded
    // clustering, while a broken probe lands at 0.0. The raw top-k rows
    // stay reachable via Similarity.ivfTopK; recall + row identity are
    // also asserted in LlmSpec.
    "llm_sim_topk_ivf" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") < 10)
        // Pinned once: the probe rows feed BOTH the contract and the
        // index cross-check — without the pin the cells-join + scoring
        // plan re-executes per consumer.
        val inline = Similarity.ivfTopK(emb, q,
          "vec_id", "embedding", k = 5, nCells = 10, nProbe = 3)
          .transform(Materialize.pin)
        val contract = Similarity.annContract(inline,
          Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5),
          emb, "vec_id", "embedding", k = 5, recallFloor = 0.2)
        val idxMatch = Similarity.resultsMatchPerQuery(inline,
          Similarity.ivfTopKFromIndex(s, ensureIvfIndex(s, dir), q,
            "vec_id", "embedding", k = 5, nProbe = 3))
        contract.join(idxMatch, Seq("query_id"))
          .select(col("query_id"), col("k_returned"), col("cos_monotone_ok"),
            col("cos_exact_ok"), col("recall_floor_ok"),
            col("rows_match").as("index_matches_inline"))
      },
      Some("""SELECT DISTINCT vec_id AS query_id, CAST(5 AS INT) AS k_returned,
             |CAST(1 AS INT) AS cos_monotone_ok, CAST(1 AS INT) AS cos_exact_ok,
             |CAST(1 AS INT) AS recall_floor_ok,
             |CAST(1 AS INT) AS index_matches_inline
             |FROM embeddings WHERE vec_id < 10""".stripMargin)),

    // The IVF write-time layout probed end-to-end: k-means runs once per
    // source content (fingerprint-cached, like the LSH index); the probe
    // reads only the nProbe cell directories via dynamic partition
    // pruning (plan-asserted in SimilaritySpec). Same contract shape as
    // llm_sim_topk_ivf, computed over the INDEX-probe rows, so the DPP
    // path carries its own hash-checked oracle row.
    "llm_sim_topk_ivf_index" -> Q(
      (s, dir) => {
        val fix = ensureIvfIndex(s, dir)
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") < 10)
        Similarity.annContract(
          Similarity.ivfTopKFromIndex(s, fix, q,
            "vec_id", "embedding", k = 5, nProbe = 3),
          Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5),
          emb, "vec_id", "embedding", k = 5, recallFloor = 0.2)
      },
      Some("""SELECT DISTINCT vec_id AS query_id, CAST(5 AS INT) AS k_returned,
             |CAST(1 AS INT) AS cos_monotone_ok, CAST(1 AS INT) AS cos_exact_ok,
             |CAST(1 AS INT) AS recall_floor_ok
             |FROM embeddings WHERE vec_id < 10""".stripMargin)),

    // INCREMENTAL IVF maintenance, end-to-end: centroids trained on half
    // the corpus, the other half assigned against the FROZEN centroids
    // and appended (no retraining — the production pattern; a rebuild is
    // a drift decision, not an ingest step). The grown index carries the
    // same contract oracle as the other IVF rows; nProbe=5 because a
    // half-trained quantizer probing 3 of 10 cells can legitimately miss
    // a query's whole neighborhood (measured min recall 0.0 at sf0.001),
    // while at 5 the floor holds with margin (min 0.2-0.8 across SFs).
    "llm_sim_topk_ivf_grown" -> Q(
      (s, dir) => {
        val fix = ensureGrownIvfIndex(s, dir)
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") < 10)
        Similarity.annContract(
          Similarity.ivfTopKFromIndex(s, fix, q,
            "vec_id", "embedding", k = 5, nProbe = 5),
          Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5),
          emb, "vec_id", "embedding", k = 5, recallFloor = 0.2)
      },
      Some("""SELECT DISTINCT vec_id AS query_id, CAST(5 AS INT) AS k_returned,
             |CAST(1 AS INT) AS cos_monotone_ok, CAST(1 AS INT) AS cos_exact_ok,
             |CAST(1 AS INT) AS recall_floor_ok
             |FROM embeddings WHERE vec_id < 10""".stripMargin)),

    // IVF quality, oracle-checked: per-query recall@5 of the IVF index
    // probe (nProbe=5 of 10 cells) against the brute-force ground truth,
    // gated on a recall FLOOR. KMeans internals aren't SQL-replicable, so
    // the oracle can't recompute the recall VALUE — but it can check the
    // quality CONTRACT: every query's recall clears 0.2. Measured margin:
    // across {4,32} cores x {sf0.001,0.01,0.1} the per-query minimum at
    // nProbe=5 is 0.4 (means 0.76-0.85), so the floor sits a full notch
    // (recall is k/5-quantized) below anything observed while a broken
    // probe (empty cells, wrong DPP, degenerate clustering) lands at 0.0
    // and goes red. Composes brute + ivfTopKFromIndex + recallAtK exactly
    // like llm_ann_recall does for LSH.
    "llm_ivf_recall" -> Q(
      (s, dir) => {
        val fix = ensureIvfIndex(s, dir)
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") < 10)
        Similarity.recallAtK(
          Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5),
          Similarity.ivfTopKFromIndex(s, fix, q, "vec_id", "embedding",
            k = 5, nProbe = 5),
          k = 5)
          .select(col("query_id"),
            (col("recall") >= 0.2).cast("int").as("meets_floor"))
      },
      Some("""SELECT DISTINCT vec_id AS query_id, CAST(1 AS INT) AS meets_floor
             |FROM embeddings WHERE vec_id < 10""".stripMargin)),

    // Range search's SCALE path: radius probe against the write-time
    // IVF index (nProbe=5 of 10 DPP-pruned cells). Contract oracle (the
    // KMeans cells aren't SQL-replicable): per query, the result must
    // be a SUBSET of the brute range set (pruning can only lose
    // neighbors — exact scores make fabrication impossible), every
    // score at/above the threshold, and recall vs brute >= 0.3 (measured
    // 0.62-1.00 across sf0.001/0.01/0.1; a broken probe lands 0.0).
    "llm_sim_range_ivf" -> Q(
      (s, dir) => {
        val fix = ensureIvfIndex(s, dir)
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") < 10)
        val brute = Similarity.rangeSearch(emb, q, "vec_id", "embedding",
          minCos = 0.25)
        val approx = Similarity.ivfRangeFromIndex(s, fix, q, "vec_id",
          "embedding", minCos = 0.25, nProbe = 5)
        val bn = brute.groupBy(col("query_id"))
          .agg(count(lit(1)).as("brute_n"))
        val an = approx.groupBy(col("query_id"))
          .agg(count(lit(1)).as("approx_n"), min(col("cos")).as("min_cos"))
        val hits = brute
          .join(approx, Seq("query_id", "cand_id"), "left_semi")
          .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
        q.select(col("vec_id").as("query_id")).distinct()
          .join(bn, Seq("query_id"), "left")
          .join(an, Seq("query_id"), "left")
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            (coalesce(col("n_hits"), lit(0L)) ===
              coalesce(col("approx_n"), lit(0L))).cast("int").as("subset_ok"),
            coalesce(col("min_cos") >= lit(0.25), lit(true)).cast("int")
              .as("cos_floor_ok"),
            when(col("brute_n").isNull, lit(1))
              .otherwise((coalesce(col("n_hits"), lit(0L)).cast("double") /
                col("brute_n") >= lit(0.3)).cast("int"))
              .as("recall_floor_ok"))
      },
      Some("""SELECT DISTINCT vec_id AS query_id, CAST(1 AS INT) AS subset_ok,
             |CAST(1 AS INT) AS cos_floor_ok, CAST(1 AS INT) AS recall_floor_ok
             |FROM embeddings WHERE vec_id < 10""".stripMargin)),

    // Range search against the GROWN index — the lifecycle twin of
    // llm_sim_topk_ivf_grown: centroids trained on half the corpus, the
    // other half appended against the frozen quantizer, then the radius
    // probe runs on the grown layout. Same three-part contract as
    // llm_sim_range_ivf (subset of brute, cos floor, recall floor) with
    // the floor at 0.2, the llm_sim_topk_ivf_grown convention for a
    // half-trained quantizer: measured per-query minimum across
    // sf0.001/0.01/0.1 at nProbe=5 is 0.29 (sf0.01; 0.57/0.66 at the
    // other decades), while a broken append (missing rows, stale
    // cells) lands at 0.0.
    "llm_sim_range_ivf_grown" -> Q(
      (s, dir) => {
        val fix = ensureGrownIvfIndex(s, dir)
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") < 10)
        val brute = Similarity.rangeSearch(emb, q, "vec_id", "embedding",
          minCos = 0.25)
        val approx = Similarity.ivfRangeFromIndex(s, fix, q, "vec_id",
          "embedding", minCos = 0.25, nProbe = 5)
        val bn = brute.groupBy(col("query_id"))
          .agg(count(lit(1)).as("brute_n"))
        val an = approx.groupBy(col("query_id"))
          .agg(count(lit(1)).as("approx_n"), min(col("cos")).as("min_cos"))
        val hits = brute
          .join(approx, Seq("query_id", "cand_id"), "left_semi")
          .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
        q.select(col("vec_id").as("query_id")).distinct()
          .join(bn, Seq("query_id"), "left")
          .join(an, Seq("query_id"), "left")
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            (coalesce(col("n_hits"), lit(0L)) ===
              coalesce(col("approx_n"), lit(0L))).cast("int").as("subset_ok"),
            coalesce(col("min_cos") >= lit(0.25), lit(true)).cast("int")
              .as("cos_floor_ok"),
            when(col("brute_n").isNull, lit(1))
              .otherwise((coalesce(col("n_hits"), lit(0L)).cast("double") /
                col("brute_n") >= lit(0.2)).cast("int"))
              .as("recall_floor_ok"))
      },
      Some("""SELECT DISTINCT vec_id AS query_id, CAST(1 AS INT) AS subset_ok,
             |CAST(1 AS INT) AS cos_floor_ok, CAST(1 AS INT) AS recall_floor_ok
             |FROM embeddings WHERE vec_id < 10""".stripMargin)),

    // Language ID over the documents corpus.
    "llm_langid" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred")),
      Some {
        val n = TextAnalysis.langProfiles.size
        val keys = TextAnalysis.langProfiles.zipWithIndex.map { case ((lang, ms), i) =>
          val mlist = ms.map(m => s"'$m'").mkString("[", ", ", "]")
          lang -> s"(len(list_filter(ws, t -> list_contains($mlist, t))) * $n + ${n - 1 - i})"
        }
        val greatestK = keys.map(_._2).mkString("greatest(", ", ", ")")
        val cases = keys.map { case (lang, k) => s"WHEN $greatestK = $k THEN '$lang'" }
          .mkString(" ")
        s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents)
           |SELECT doc_id, CASE $cases END AS lang_pred FROM norm""".stripMargin
      }),

    // Quality signals + combined score — one scan, one projection (the
    // score is pure arithmetic over three signal columns).
    "llm_quality" -> Q(
      (s, dir) => qualityScored(s, dir),
      Some(s"""WITH sig AS ($qualitySigSql)
              |SELECT doc_id, n_chars, n_tokens, chars_per_token,
              |  long_token_ratio, punct_ratio, stopword_ratio,
              |  $qualityExprSql AS quality
              |FROM sig""".stripMargin)),

    // Score-proportional sampling over the SAME quality score: keep each
    // doc with probability = its quality (hash-thresholded in ppm — a
    // pure scan-stage filter under its own "qw:" salt). The oracle
    // recomputes the identical score (llm_quality proves it bit-matches)
    // and the identical floor(q*1e6) threshold.
    "llm_quality_sample" -> Q(
      (s, dir) => Curation.scoreWeightedSample(
        qualityScored(s, dir).select(col("doc_id"), col("quality")),
        "doc_id", "quality"),
      Some(s"""WITH sig AS ($qualitySigSql),
              |q AS (SELECT doc_id, $qualityExprSql AS quality FROM sig)
              |SELECT doc_id, quality FROM q
              |WHERE ${h60("'qw:' || CAST(doc_id AS VARCHAR)")} % 1000000
              |  < CAST(floor(least(greatest(quality, 0.0), 1.0) * 1e6)
              |         AS BIGINT)""".stripMargin)),

    // Exact-k weighted sampling without replacement (Efraimidis–
    // Spirakis): 200 docs with probability proportional to length —
    // keys = ln(u)/w from the hash lattice, pinned to 1e-12 units, top-k
    // by (key, doc_id). The exact-count weighted complement of
    // llm_quality_sample's Bernoulli rate filter.
    "llm_weighted_sample" -> Q(
      (s, dir) => Curation.weightedSampleExactK(
        Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 200),
      Some(s"""WITH u AS (SELECT doc_id, n_chars,
              |  (CAST(${h60("'ws:' || CAST(doc_id AS VARCHAR)")} % 1000000
              |     AS DOUBLE) + 0.5) / 1000000.0 AS u
              |  FROM documents WHERE CAST(n_chars AS DOUBLE) > 0.0),
              |k AS (SELECT doc_id, n_chars,
              |  CAST(floor(ln(u) / CAST(n_chars AS DOUBLE) * 1e12 + 0.5)
              |    AS BIGINT) AS key_units FROM u)
              |SELECT doc_id, n_chars, key_units FROM k
              |ORDER BY key_units DESC, doc_id LIMIT 200""".stripMargin)),

    // Corpus length distribution per language: exact interpolated
    // percentiles (the curation dashboard numbers).
    "llm_quality_quantiles" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(
          expr("percentile(n_chars, 0.5)").as("p50"),
          expr("percentile(n_chars, 0.9)").as("p90"),
          expr("percentile(n_chars, 0.99)").as("p99"),
          count(lit(1)).as("n")),
      Some("""SELECT lang, quantile_cont(n_chars, 0.5) AS p50,
             |quantile_cont(n_chars, 0.9) AS p90,
             |quantile_cont(n_chars, 0.99) AS p99,
             |CAST(count(*) AS BIGINT) AS n
             |FROM documents GROUP BY 1""".stripMargin)),

    // Corpus-relative quality gate: keep docs at/above the median
    // quality score. The threshold is the exact interpolated percentile
    // (bit-portable) delivered by scalar subquery — a data-derived
    // runtime filter, no join. Oracle recomputes the same quantile_cont.
    "llm_quality_gate" -> Q(
      (s, dir) => TextAnalysis.qualityGate(
        Tables.documents(s, dir), "doc_id", "text", quantile = 0.5),
      Some {
        val stop = TextAnalysis.langProfiles.flatMap(_._2).distinct
          .map(m => s"'$m'").mkString("[", ", ", "]")
        s"""WITH q AS (
           |SELECT doc_id,
           |  (least((length(text)::DOUBLE / len(${toksSql("text")})::DOUBLE)
           |     / 8.0, 1.0)
           |   + least((len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE /
           |       length(text)::DOUBLE) * 20.0, 1.0)
           |   + least((len(list_filter(${toksSql("text")},
           |       x -> list_contains($stop, x)))::DOUBLE /
           |       len(${toksSql("text")})::DOUBLE) * 5.0, 1.0)) / 3.0
           |    AS quality
           |FROM documents),
           |m AS (SELECT quantile_cont(quality, 0.5) AS t FROM q)
           |SELECT doc_id, quality FROM q CROSS JOIN m
           |WHERE quality >= t""".stripMargin
      }),

    // Token counting: whitespace + BPE-ish pre-tokenizer pieces.
    "llm_tokens" -> Q(
      (s, dir) => TextAnalysis.tokenCounts(Tables.documents(s, dir), "doc_id", "text"),
      Some(s"""SELECT doc_id,
         |CAST(len(${toksSql("text")}) AS BIGINT) AS ws_tokens,
         |CAST(len(regexp_extract_all(${normSql("text")},
         |  '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_ish_tokens
         |FROM documents""".stripMargin)),

    // PII redaction with per-type accounting: deterministic email / IPv4 /
    // phone strings are injected per doc, then scrubbed. The patterns are
    // an RE2-safe subset, so Java regex (Spark) and RE2 (DuckDB) match
    // identically; counts are measured in the same fixed pattern order on
    // both sides.
    "llm_pii_redact" -> Q(
      (s, dir) => {
        val withPii = Tables.documents(s, dir).select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com from 10.0."),
            (col("doc_id") % 256).cast("string"),
            lit(".7 call +1 (555) 010-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
        TextAnalysis.redactPii(withPii, "doc_id", "text")
      },
      Some {
        val steps = TextAnalysis.piiPatterns.zipWithIndex.map {
          case ((name, pattern, replacement), i) =>
            s"""s${i + 1} AS (SELECT doc_id, ${
              (0 until i).map(j => s"n_${TextAnalysis.piiPatterns(j)._1}, ").mkString
            }CAST(len(regexp_extract_all(t, '$pattern')) AS BIGINT) AS n_$name,
               |  regexp_replace(t, '$pattern', '$replacement', 'g') AS t FROM s$i)""".stripMargin
        }
        val names = TextAnalysis.piiPatterns.map { case (n, _, _) => s"n_$n" }
        s"""WITH s0 AS (SELECT doc_id,
           |  text || ' contact user' || doc_id || '@example.com from 10.0.' ||
           |  (doc_id % 256) || '.7 call +1 (555) 010-' ||
           |  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
           |  FROM documents),
           |${steps.mkString(",\n")}
           |SELECT doc_id, t AS redacted, ${names.mkString(", ")}
           |FROM s${TextAnalysis.piiPatterns.size}""".stripMargin
      }),

    // Streaming PII-REDACTION transform, batch parity: the per-micro-
    // batch body of [[graft.streaming.Streams.startPiiRedactSink]] (the
    // sixth ingest stage — a stateless per-row transform, no index or
    // artifact) applied to an arriving batch that mixes PII-laden rows
    // (injected email/IP/phone, the llm_pii_redact fixture shifted out
    // of corpus id range) with untouched rows. The oracle replays the
    // fixed-order regex chain on the same arriving frame — a full
    // replay, like the other five gate rows; StreamsSpec replays the
    // same dataflow through MemoryStream including a restart.
    "llm_stream_pii_redact" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val arriving = docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 7000000L).as("doc_id"),
            concat(col("text"),
              lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com from 10.0."),
              (col("doc_id") % 256).cast("string"),
              lit(".7 call +1 (555) 010-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
          .unionByName(docs.filter(col("doc_id") % 5 === 1)
            .select((col("doc_id") + 8000000L).as("doc_id"), col("text")))
        TextAnalysis.redactPii(arriving, "doc_id", "text")
      },
      Some {
        val steps = TextAnalysis.piiPatterns.zipWithIndex.map {
          case ((name, pattern, replacement), i) =>
            s"""s${i + 1} AS (SELECT doc_id, ${
              (0 until i).map(j => s"n_${TextAnalysis.piiPatterns(j)._1}, ").mkString
            }CAST(len(regexp_extract_all(t, '$pattern')) AS BIGINT) AS n_$name,
               |  regexp_replace(t, '$pattern', '$replacement', 'g') AS t FROM s$i)""".stripMargin
        }
        val names = TextAnalysis.piiPatterns.map { case (n, _, _) => s"n_$n" }
        s"""WITH s0 AS (
           |  SELECT doc_id + 7000000 AS doc_id,
           |    text || ' contact user' || doc_id || '@example.com from 10.0.' ||
           |    (doc_id % 256) || '.7 call +1 (555) 010-' ||
           |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
           |  FROM documents WHERE doc_id % 5 = 0
           |  UNION ALL
           |  SELECT doc_id + 8000000 AS doc_id, text AS t
           |  FROM documents WHERE doc_id % 5 = 1),
           |${steps.mkString(",\n")}
           |SELECT doc_id, t AS redacted, ${names.mkString(", ")}
           |FROM s${TextAnalysis.piiPatterns.size}""".stripMargin
      }),

    // Repetitiousness (the Gopher boilerplate gate): the hottest 2-gram's
    // share of all the doc's 2-grams. Counts are exact integers; the
    // ratio is one exact double division.
    "llm_repetition" -> Q(
      (s, dir) => TextAnalysis.repetitionSignals(
        Tables.documents(s, dir), "doc_id", "text", n = 2),
      Some(s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
         |g AS (SELECT doc_id, unnest(CASE WHEN len(ws) - 1 >= 1
         |  THEN list_transform(range(1, len(ws)),
         |         i -> array_to_string(ws[i:i+1], ' '))
         |  ELSE [array_to_string(ws, ' ')] END) AS g FROM norm),
         |c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
         |  CAST(max(c) AS BIGINT) AS max_gram_freq,
         |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS max_gram_ratio
         |FROM c GROUP BY 1""".stripMargin)),

    // Rolling-hash document fingerprints (full + 16-token prefix).
    "llm_fingerprint" -> Q(
      (s, dir) => TextAnalysis.fingerprints(Tables.documents(s, dir),
        "doc_id", "text", prefixTokens = 16),
      Some {
        def roll(l: String) =
          s"""list_reduce(list_prepend(0::BIGINT, list_transform($l,
             |  t -> ${h60("t")} % 1000000007)), (acc, h) -> (acc * 31 + h) % 1000000007)""".stripMargin
        s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents)
           |SELECT doc_id, ${roll("ws")} AS fp, ${roll("ws[1:16]")} AS prefix_fp
           |FROM norm""".stripMargin
      }),

    // The composed curation pipeline: quality gate -> exact dedup (vs a
    // perturbed duplicate of the corpus) -> token accounting per language.
    // One declarative plan end-to-end; Catalyst fuses the projections and
    // the only shuffles are the dedup groupBy and the final rollup.
    "llm_curation_pipeline" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val perturbed = docs.withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("text", upper(concat(col("text"), lit("  "))))
        val corpus = docs.unionByName(perturbed)
        val scored = TextAnalysis.qualityScore(corpus, "doc_id", "text")
        val kept = corpus.join(scored, Seq("doc_id")).filter(col("quality") >= 0.3)
        val deduped = Dedup.exactDedup(kept, "doc_id", "text")
          .join(docs.select("doc_id", "text", "lang"), Seq("doc_id"))
        val counted = TextAnalysis.tokenCounts(deduped, "doc_id", "text")
          .join(deduped.select("doc_id", "lang"), Seq("doc_id"))
        counted.groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("ws_tokens")).as("total_tokens"),
          sum(col("bpe_ish_tokens")).as("total_bpe"))
      },
      Some {
        val stop = TextAnalysis.langProfiles.flatMap(_._2).distinct
          .map(m => s"'$m'").mkString("[", ", ", "]")
        // The perturbed copies normalize to the same text, so exact dedup
        // keeps min-id representatives of each NORMALIZED-TEXT group of
        // kept originals (cross-doc duplicate texts collapse too — 8
        // pairs at sf0.1); a group whose only kept member is perturbed
        // drops at the join-back. The quality gate applies per original.
        s"""WITH q AS (SELECT doc_id, lang, text,
           |  length(text)::DOUBLE / len(${toksSql("text")})::DOUBLE AS cpt,
           |  len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE /
           |    length(text)::DOUBLE AS pr,
           |  len(list_filter(${toksSql("text")}, x -> list_contains($stop, x)))::DOUBLE /
           |    len(${toksSql("text")})::DOUBLE AS sr
           |  FROM documents),
           |kept AS (SELECT doc_id, lang, text FROM q
           |  WHERE (least(cpt / 8.0, 1.0) + least(pr * 20.0, 1.0)
           |         + least(sr * 5.0, 1.0)) / 3.0 >= 0.3),
           |rep AS (SELECT min(doc_id) AS doc_id FROM kept
           |  GROUP BY ${normSql("text")}),
           |fin AS (SELECT k.lang, k.text FROM kept k JOIN rep USING (doc_id))
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(len(${toksSql("text")})) AS BIGINT) AS total_tokens,
           |  CAST(sum(len(regexp_extract_all(${normSql("text")},
           |    '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS total_bpe
           |FROM fin GROUP BY 1""".stripMargin
      }),

    // Multimodal: binary payload columns + the batched decode kernel,
    // BOTH paths oracle-checked. Even doc_ids carry real PNGs whose
    // dimensions are arithmetic in the id, so the REAL javax.imageio
    // decode (and only a real decode — PNG byte length has no simple
    // relation to the embedded dims) reproduces them; odd doc_ids carry
    // UTF-8 "video" payloads through the documented deterministic stub,
    // whose outputs are arithmetic in the text byte length. n_bytes is
    // dropped for image rows only because encoded-PNG size is
    // encoder-version-dependent — the dims are the decode proof.
    "llm_multimodal_features" -> Q(
      (s, dir) => {
        implicit val sp = s
        val media = Multimodal.syntheticMedia(
          Tables.documents(s, dir), "doc_id", "text")
        Multimodal.extractFeatures(media)
          .toDF().drop("byte_checksum").drop("n_bytes")
      },
      Some("""SELECT doc_id AS media_id,
         |CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS modality,
         |CAST(CASE WHEN doc_id % 2 = 0 THEN 8 + doc_id % 32
         |  ELSE 64 + octet_length(encode(text)) % 512 END AS INT) AS width,
         |CAST(CASE WHEN doc_id % 2 = 0 THEN 8 + (doc_id // 3) % 32
         |  ELSE 64 + (octet_length(encode(text)) // 7) % 512 END AS INT) AS height,
         |CAST(3 AS INT) AS channels,
         |CAST(CASE WHEN doc_id % 2 = 0 THEN 1
         |  ELSE 1 + octet_length(encode(text)) % 30 END AS INT) AS n_frames
         |FROM documents""".stripMargin)),

    // Image perceptual hash: REAL pixel decode certified at the DATA
    // level (where llm_multimodal_features certifies the header parse).
    // Every pixel of the grouped-PNG fixture is integer arithmetic in
    // (doc_id, x, y), so the oracle regenerates the field and replays
    // the luma → 9x7 box-average → adjacent-column-comparison chain in
    // exact int64 math — the 56-bit dHash matches bit-for-bit iff the
    // Spark side genuinely decoded the pixels.
    "llm_image_phash" -> Q(
      (s, dir) => {
        implicit val sp = s
        Multimodal.extractImageHashes(
          Multimodal.syntheticImageGroups(
            Tables.documents(s, dir), "doc_id")).toDF()
      },
      Some(s"""$phashCte
         |SELECT doc_id AS media_id, w AS width, h AS height,
         |  CAST(dhash AS BIGINT) AS dhash
         |FROM ph""".stripMargin)),

    // Image NEAR-DUP pairs under the WIDE 110-bit signature — the
    // corpus-scale escape from 56-bit band-key saturation: horizontal
    // (56-bit) + vertical (54-bit) dHash words from ONE cell pass, so
    // the maxHamming=7 banding carries 13-14-bit keys (8192-16384
    // values) instead of 7-bit (128) — candidate mass drops ~2^7 at the
    // same pigeonhole recall, the exact move the text family made with
    // the 120-bit wide simhash. Pairs here satisfy total two-word
    // hamming <= 7 (a strictly stronger match than the narrow row's);
    // the oracle replays the vertical word, the proportional band
    // slicing (generated from the same starts/widths arithmetic), and
    // the two-word verify.
    "llm_image_neardup_wide" -> Q(
      (s, dir) => {
        implicit val sp = s
        val hashes = Multimodal.extractImageHashesWide(
          Multimodal.syntheticImageGroups(
            Tables.documents(s, dir), "doc_id")).toDF()
        Dedup.hammingNearDupPairsWide(hashes, "media_id", "dhash", "vhash",
          nLoBits = 56, nHiBits = 54, maxHamming = 7)
      },
      Some(s"""$phashCte,
         |$phashWideCte,
         |wbanded AS (${wideBandSlicesSql("phw", "dhash", 56, "vhash", 54, 7)}),
         |wcand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         |  a.dhash AS da, a.vhash AS va, c.dhash AS db, c.vhash AS vb
         |  FROM wbanded a JOIN wbanded c
         |  ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(da, db)) + bit_count(xor(va, vb)) AS INT)
         |    AS hamming
         |FROM wcand
         |WHERE bit_count(xor(da, db)) + bit_count(xor(va, vb)) <= 7""".stripMargin)),

    // CROSS-MODAL pair integrity (round-17): caption–image TRAINING-PAIR
    // CONTAMINATION — image near-dup mates whose captions sit in
    // DIFFERENT text near-dup clusters, i.e. the same visual input
    // supervised with contradictory targets. Composes three existing
    // layers without any new candidate generation: wide banded image
    // pairs (never all-pairs) × text minhash-LSH clusters (pointer-jump
    // closure) × id-keyed caption assignment. The designed fixture
    // makes every decision class present: within each 4-member image
    // group, members 0-1 SHARE the group-leader caption (same caption
    // key — image dup, benign), members 2-3 carry their OWN captions
    // (different keys — contaminated); natural text near-dups that pull
    // two captions into one cluster de-flag the pair identically in
    // both engines. The oracle replays the pixel→hash chain, the wide
    // banded candidacy, the recursive text-cluster closure, and the
    // caption keying row-for-row.
    "llm_pair_contamination" -> Q(
      (s, dir) => {
        implicit val sp = s
        val docs = Tables.documents(s, dir)
        val hashes = Multimodal.extractImageHashesWide(
          Multimodal.syntheticImageGroups(docs, "doc_id")).toDF()
        val imgPairs = Dedup.hammingNearDupPairsWide(hashes, "media_id",
          "dhash", "vhash", nLoBits = 56, nHiBits = 54, maxHamming = 7)
        val captionOf = docs.select(col("doc_id"),
          when(col("doc_id") % 4 < 2, col("doc_id") - (col("doc_id") % 4))
            .otherwise(col("doc_id")).as("caption_doc"))
        val clusters = Dedup.dedupClusters(Dedup.minhashLshPairs(docs,
            "doc_id", "text", shingleK = 3, bands = 8, rowsPerBand = 2,
            threshold = 0.5))
          .withColumnRenamed("doc_id", "caption_doc")
        val keys = CrossModal.captionKeysFromClusters(captionOf, clusters,
          "doc_id", "caption_doc", "cluster_id")
        CrossModal.pairContamination(imgPairs, keys, "doc_id", "key")
      },
      Some(s"""$clustersCteSql,
         |${phashChainSql("", "SELECT doc_id FROM documents")},
         |${phashWideExtSql("")},
         |wbanded AS (${wideBandSlicesSql("phw", "dhash", 56, "vhash", 54, 7)}),
         |wcand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         |  a.dhash AS da, a.vhash AS va, c.dhash AS db, c.vhash AS vb
         |  FROM wbanded a JOIN wbanded c
         |  ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id),
         |ip AS (SELECT id_a, id_b,
         |  CAST(bit_count(xor(da, db)) + bit_count(xor(va, vb)) AS INT)
         |    AS hamming
         |  FROM wcand
         |  WHERE bit_count(xor(da, db)) + bit_count(xor(va, vb)) <= 7),
         |cap AS (SELECT doc_id,
         |  CASE WHEN doc_id % 4 < 2 THEN doc_id - (doc_id % 4)
         |       ELSE doc_id END AS caption_doc
         |  FROM documents),
         |ck AS (SELECT cap.doc_id, coalesce(cl.cluster_id, cap.caption_doc)
         |    AS key
         |  FROM cap LEFT JOIN cl ON cl.doc_id = cap.caption_doc)
         |SELECT ip.id_a, ip.id_b, ip.hamming,
         |  a.key AS key_a, b.key AS key_b
         |FROM ip JOIN ck a ON a.doc_id = ip.id_a
         |  JOIN ck b ON b.doc_id = ip.id_b
         |WHERE a.key <> b.key""".stripMargin)),

    // CROSS-MODAL pair integrity, the INVERSE defect (round-17):
    // BOILERPLATE captions — text near-dup mates (the minhash-LSH pair
    // output, banded candidates by construction) whose paired IMAGES
    // are NOT perceptual near-dups: a repeated alt-text template over
    // unrelated pictures, the contamination that teaches a captioner
    // to ignore its input. Image distance is recomputed id-keyed from
    // the wide two-word signatures on the edge-sized pair set — no new
    // candidate generation, no all-pairs. The oracle replays the
    // minhash banding + jaccard verify, the pixel→hash chain, and the
    // two-word hamming row-for-row.
    "llm_caption_boilerplate" -> Q(
      (s, dir) => {
        implicit val sp = s
        val docs = Tables.documents(s, dir)
        val capPairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
          shingleK = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
        val hashes = Multimodal.extractImageHashesWide(
          Multimodal.syntheticImageGroups(docs, "doc_id")).toDF()
        CrossModal.captionBoilerplate(capPairs, hashes, "media_id",
          "dhash", "vhash", maxHamming = 7)
      },
      Some(s"""$clustersCteSql,
         |${phashChainSql("", "SELECT doc_id FROM documents")},
         |${phashWideExtSql("")}
         |SELECT p.id_a, p.id_b,
         |  CAST(bit_count(xor(a.dhash, b.dhash))
         |    + bit_count(xor(a.vhash, b.vhash)) AS INT) AS img_hamming
         |FROM pairs p JOIN phw a ON a.doc_id = p.id_a
         |  JOIN phw b ON b.doc_id = p.id_b
         |WHERE bit_count(xor(a.dhash, b.dhash))
         |  + bit_count(xor(a.vhash, b.vhash)) > 7""".stripMargin)),

    // Image near-dup at CORPUS scale: the write-time WIDE hamming index
    // ([[Dedup.writeHammingWideIndex]] — 110-bit two-word layout,
    // 13–14-bit band keys) probed with the first 50 images as the delta
    // batch. Build decodes every corpus image once; the probe decodes
    // ONLY the delta and joins the index on its partition columns
    // (DPP-pruned read), the two-word hamming verified against the
    // carried signatures. The retired narrow 56-bit layout's 7-bit band
    // keys saturate at corpus scale (measured exactly quadratic,
    // BASELINE.md round-15); this is the layout a 100 TB ingest
    // actually uses. The oracle replays the pixel-exact hash chain,
    // the vertical word, AND the wide banded candidacy, delta-oriented.
    "llm_image_index_probe_wide" -> Q(
      (s, dir) => {
        implicit val sp = s
        val fix = ensureImageHashWideIndex(s, dir)
        val delta = Multimodal.extractImageHashesWide(
          Multimodal.syntheticImageGroups(
            Tables.documents(s, dir).filter(col("doc_id") < 50),
            "doc_id")).toDF()
        Dedup.probeHammingWideIndex(s, fix, delta, "media_id", "dhash",
          "vhash", nLoBits = 56, nHiBits = 54, maxHamming = 7,
          nBuckets = Dedup.hammingWideIndexBuckets(s, fix))
      },
      Some(s"""$phashCte,
         |$phashWideCte,
         |wbanded AS (${wideBandSlicesSql("phw", "dhash", 56, "vhash", 54, 7)}),
         |wcand AS (SELECT DISTINCT q.doc_id AS query_id, c.doc_id AS cand_id,
         |  q.dhash AS qd, q.vhash AS qv, c.dhash AS cd, c.vhash AS cv
         |  FROM wbanded c JOIN wbanded q
         |  ON c.band = q.band AND c.key = q.key AND c.doc_id <> q.doc_id
         |  WHERE q.doc_id < 50)
         |SELECT query_id, cand_id,
         |  CAST(bit_count(xor(qd, cd)) + bit_count(xor(qv, cv)) AS INT)
         |    AS hamming
         |FROM wcand
         |WHERE bit_count(xor(qd, cd)) + bit_count(xor(qv, cv)) <= 7""".stripMargin)),

    // Image dedup CLUSTERS: WIDE near-dup pairs -> connected components
    // -> one canonical id (min member) per involved image — the
    // [[Dedup.dedupClusters]] pointer-jump closure on the corpus-scale
    // 110-bit pair source (migrated off the narrow 56-bit banding whose
    // candidate mass is quadratic at corpus size). The oracle replays
    // the hash chain, the vertical word, the wide banded candidacy, and
    // the transitive closure (recursive CTE).
    "llm_image_dedup_clusters" -> Q(
      (s, dir) => {
        implicit val sp = s
        val hashes = Multimodal.extractImageHashesWide(
          Multimodal.syntheticImageGroups(
            Tables.documents(s, dir), "doc_id")).toDF()
        Dedup.dedupClusters(Dedup.hammingNearDupPairsWide(hashes,
          "media_id", "dhash", "vhash", nLoBits = 56, nHiBits = 54,
          maxHamming = 7))
      },
      Some(s"""${phashCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |$phashWideCte,
         |wbanded AS (${wideBandSlicesSql("phw", "dhash", 56, "vhash", 54, 7)}),
         |wcand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         |  a.dhash AS da, a.vhash AS va, c.dhash AS db, c.vhash AS vb
         |  FROM wbanded a JOIN wbanded c
         |  ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id),
         |pairs AS (SELECT id_a, id_b FROM wcand
         |  WHERE bit_count(xor(da, db)) + bit_count(xor(va, vb)) <= 7),
         |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (SELECT s, d FROM edges
         |  UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |cl AS (SELECT s AS doc_id, least(s, min(d)) AS cluster_id
         |  FROM reach GROUP BY s)
         |SELECT doc_id, cluster_id FROM cl""".stripMargin)),

    // Audio: REAL WAV decode, separately visible from the image row (a
    // stub regression in one modality must not hide behind the other's
    // pass). Every doc_id becomes a real PCM WAV whose sample rate /
    // channels / frame count are arithmetic in the id and live ONLY in
    // the RIFF header — so the oracle passes iff a genuine container
    // parse (javax.sound.sampled) recovers them. Encoder-dependent
    // columns (n_bytes, byte_checksum) are dropped, exactly as encoded
    // PNG size is for images; duration_ms is integer floor math, exact
    // in both engines.
    "llm_audio_features" -> Q(
      (s, dir) => {
        implicit val sp = s
        val media = Multimodal.syntheticAudio(Tables.documents(s, dir), "doc_id")
        Multimodal.extractAudioFeatures(media)
          .toDF().drop("byte_checksum").drop("n_bytes")
      },
      Some("""SELECT doc_id AS media_id,
         |CAST(8000 * (1 + doc_id % 3) AS INT) AS sample_rate,
         |CAST(1 + doc_id % 2 AS INT) AS channels,
         |CAST(16 AS INT) AS bits_per_sample,
         |CAST(200 + doc_id % 300 AS BIGINT) AS n_frames,
         |CAST((200 + doc_id % 300) * 1000 // (8000 * (1 + doc_id % 3))
         |  AS BIGINT) AS duration_ms
         |FROM documents""".stripMargin)),

    // Audio SAMPLE decode: where llm_audio_features certifies the
    // container parse, this certifies the PCM payload itself — exact
    // integer energy / |sum| / peak over every decoded 16-bit sample.
    // The WAV samples are a pure integer function of (id, frame,
    // channel), so DuckDB regenerates them and the aggregates must
    // match bit-for-bit; only a decoder that really reads the data
    // section (correct endianness, correct frame layout) passes.
    "llm_audio_energy" -> Q(
      (s, dir) => {
        implicit val sp = s
        val media = Multimodal.syntheticAudio(Tables.documents(s, dir), "doc_id")
        Multimodal.extractAudioContent(media).toDF()
      },
      Some("""WITH idx AS (SELECT doc_id, 1 + doc_id % 2 AS ch,
         |  unnest(range(0, (200 + doc_id % 300) * (1 + doc_id % 2)))
         |    AS i FROM documents),
         |s AS (SELECT doc_id,
         |  ((doc_id*31 + (i // ch)*7 + (i % ch)*13) % 65536 - 32768) AS s
         |  FROM idx)
         |SELECT doc_id AS media_id,
         |  CAST(1 + doc_id % 2 AS INT) AS channels,
         |  CAST(200 + doc_id % 300 AS BIGINT) AS n_frames,
         |  CAST(sum(s*s) AS BIGINT) AS sum_sq,
         |  CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
         |  CAST(max(abs(s)) AS INT) AS peak_abs
         |FROM s GROUP BY 1, 2, 3""".stripMargin)),

    // Audio perceptual FINGERPRINT: the 110-bit wide family's audio
    // member — 56-bit energy-envelope word + 54-bit gain-invariant
    // flux-ratio word over 57 proportional PCM segments. The designed
    // WAV fixture pins every bit: the envelope word IS the (member-
    // flipped) amplitude salt, the flux word the period-salt
    // comparisons — and the oracle replays the full E/D feature chain
    // in exact integer SQL, so the row passes iff the Spark side
    // genuinely decoded the PCM data section and folded the same
    // segment features.
    "llm_audio_fingerprint" -> Q(
      (s, dir) => {
        implicit val sp = s
        Multimodal.extractAudioHashesWide(
          Multimodal.syntheticAudioGroups(
            Tables.documents(s, dir), "doc_id")).toDF()
      },
      Some(s"""$audioFpCte
         |SELECT doc_id AS media_id,
         |  CAST(8000 * (1 + (doc_id // 4) % 3) AS INT) AS sample_rate,
         |  CAST(3648 AS BIGINT) AS n_frames, ehash, rhash FROM afp""".stripMargin)),

    // Audio NEAR-DUP pairs under the wide 110-bit fingerprint — the
    // audio modality joins the same corpus-scale banded machinery as
    // image/video/text (13–14-bit band keys, pigeonhole recall, no
    // all-pairs join anywhere). Intra-group pairs land at the DESIGNED
    // hamming |min(m,3) − min(m',3)| ≤ 3 (amplitude-step flips are
    // local to their comparison bit; the flux word is untouched by
    // member perturbation); the oracle replays the fingerprint chain,
    // the shared wideBandLayout slicing, and the two-word verify.
    "llm_audio_neardup" -> Q(
      (s, dir) => {
        implicit val sp = s
        val hashes = Multimodal.extractAudioHashesWide(
          Multimodal.syntheticAudioGroups(
            Tables.documents(s, dir), "doc_id")).toDF()
        Dedup.hammingNearDupPairsWide(hashes, "media_id", "ehash", "rhash",
          nLoBits = 56, nHiBits = 54, maxHamming = 7)
      },
      Some(s"""$audioFpCte,
         |wbanded AS (${wideBandSlicesSql("afp", "ehash", 56, "rhash", 54, 7)}),
         |wcand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         |  a.ehash AS ea, a.rhash AS ra, c.ehash AS eb, c.rhash AS rb
         |  FROM wbanded a JOIN wbanded c
         |  ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(ea, eb)) + bit_count(xor(ra, rb)) AS INT)
         |    AS hamming
         |FROM wcand
         |WHERE bit_count(xor(ea, eb)) + bit_count(xor(ra, rb)) <= 7""".stripMargin)),

    // Audio near-dup at CORPUS scale: the write-time WIDE hamming
    // index probed with the first 50 clips as the delta batch — build
    // decodes every corpus WAV once, the probe decodes ONLY the delta
    // and joins the index on its partition columns (DPP-pruned read).
    // Identical layout/machinery to llm_image_index_probe_wide; only
    // the signature kernel differs — the audio modality inherits the
    // ingest path's scale posture for free.
    "llm_audio_index_probe_wide" -> Q(
      (s, dir) => {
        implicit val sp = s
        val fix = ensureAudioHashWideIndex(s, dir)
        val delta = Multimodal.extractAudioHashesWide(
          Multimodal.syntheticAudioGroups(
            Tables.documents(s, dir).filter(col("doc_id") < 50),
            "doc_id")).toDF()
        Dedup.probeHammingWideIndex(s, fix, delta, "media_id", "ehash",
          "rhash", nLoBits = 56, nHiBits = 54, maxHamming = 7,
          nBuckets = Dedup.hammingWideIndexBuckets(s, fix))
      },
      Some(s"""$audioFpCte,
         |wbanded AS (${wideBandSlicesSql("afp", "ehash", 56, "rhash", 54, 7)}),
         |wcand AS (SELECT DISTINCT q.doc_id AS query_id, c.doc_id AS cand_id,
         |  q.ehash AS qe, q.rhash AS qr, c.ehash AS ce, c.rhash AS cr
         |  FROM wbanded c JOIN wbanded q
         |  ON c.band = q.band AND c.key = q.key AND c.doc_id <> q.doc_id
         |  WHERE q.doc_id < 50)
         |SELECT query_id, cand_id,
         |  CAST(bit_count(xor(qe, ce)) + bit_count(xor(qr, cr)) AS INT)
         |    AS hamming
         |FROM wcand
         |WHERE bit_count(xor(qe, ce)) + bit_count(xor(qr, cr)) <= 7""".stripMargin)),

    // Audio dedup CLUSTERS: wide near-dup pairs → connected components
    // → one canonical id per involved clip ([[Dedup.dedupClusters]]'s
    // pointer-jump closure — the same operator the image/video/text
    // families use, now over the audio fingerprint). The oracle replays
    // the full chain plus the transitive closure (recursive CTE).
    "llm_audio_dedup_clusters" -> Q(
      (s, dir) => {
        implicit val sp = s
        val hashes = Multimodal.extractAudioHashesWide(
          Multimodal.syntheticAudioGroups(
            Tables.documents(s, dir), "doc_id")).toDF()
        Dedup.dedupClusters(Dedup.hammingNearDupPairsWide(hashes,
          "media_id", "ehash", "rhash", nLoBits = 56, nHiBits = 54,
          maxHamming = 7))
      },
      Some(s"""${audioFpCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |wbanded AS (${wideBandSlicesSql("afp", "ehash", 56, "rhash", 54, 7)}),
         |wcand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         |  a.ehash AS ea, a.rhash AS ra, c.ehash AS eb, c.rhash AS rb
         |  FROM wbanded a JOIN wbanded c
         |  ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id),
         |pairs AS (SELECT id_a, id_b FROM wcand
         |  WHERE bit_count(xor(ea, eb)) + bit_count(xor(ra, rb)) <= 7),
         |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (SELECT s, d FROM edges
         |  UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |cl AS (SELECT s AS doc_id, least(s, min(d)) AS cluster_id
         |  FROM reach GROUP BY s)
         |SELECT doc_id, cluster_id FROM cl""".stripMargin)),

    // REAL audio resample, end-to-end certified: decode PCM16 →
    // linear-interpolate onto a 12 kHz grid (exact integer arithmetic;
    // JVM truncating division == DuckDB `//`) → re-encode WAV →
    // re-decode → integer energy aggregates. The source rates
    // (8/16/24 kHz by id) exercise up- AND down-sampling. The oracle
    // replays the interpolation symbolically from the id-arithmetic
    // samples — only a resampler that actually reads, interpolates,
    // and re-encodes the PCM data reproduces every aggregate.
    // Video: REAL RIFF/AVI container-metadata parse (the layer
    // llm_audio_features certifies for WAV). Every doc_id becomes a
    // structurally-genuine AVI whose width / height / fps rational /
    // frame count are arithmetic in the id and live ONLY in the avih +
    // vids-strh headers a chunk walk must find — so the oracle passes
    // iff decodeVideoMeta genuinely parses the container. Encoder-
    // dependent columns (n_bytes, byte_checksum) dropped as in the
    // image/audio rows; duration_ms is truncating integer math, exact
    // in both engines (DuckDB `//` == JVM `/` here: all values
    // non-negative).
    "llm_video_features" -> Q(
      (s, dir) => {
        implicit val sp = s
        val media = Multimodal.syntheticVideo(Tables.documents(s, dir), "doc_id")
        Multimodal.extractVideoFeatures(media)
          .toDF().drop("byte_checksum").drop("n_bytes")
      },
      Some("""WITH p AS (SELECT doc_id,
         |  160 + (doc_id % 40) * 8 AS w,
         |  120 + (doc_id % 30) * 8 AS h,
         |  CASE doc_id % 4 WHEN 0 THEN 24 WHEN 1 THEN 8
         |    WHEN 2 THEN 4 ELSE 32 END AS bc
         |  FROM documents)
         |SELECT doc_id AS media_id,
         |CAST(w AS INT) AS width,
         |CAST(h AS INT) AS height,
         |CAST(10 + doc_id % 50 AS INT) AS fps_rate,
         |CAST(1 + doc_id % 3 AS INT) AS fps_scale,
         |CAST(25 + doc_id % 200 AS BIGINT) AS n_frames,
         |CAST((25 + doc_id % 200) * 1000 * (1 + doc_id % 3)
         |  // (10 + doc_id % 50) AS BIGINT) AS duration_ms,
         |CAST(bc AS INT) AS bit_count,
         |CAST(doc_id % 4 AS BIGINT) AS compression,
         |CAST(((w * bc + 31) // 32) * 4 * h AS BIGINT) AS size_image
         |FROM p""".stripMargin)),

    // Video FIRST-FRAME perceptual hash: REAL pixel decode certified at
    // the DATA level (llm_video_features certifies the container walk).
    // The fixture AVIs carry a genuine uncompressed 00db frame whose
    // pixels are integer arithmetic in (group, x, y); only a decoder
    // that honestly reads the DIB bytes — 4-byte row stride, bottom-up
    // rows, BGR channel order — reproduces the 56-bit dHash the oracle
    // recomputes symbolically. Same dhash9x7 kernel as the image family:
    // one signature definition across modalities.
    "llm_video_phash" -> Q(
      (s, dir) => {
        implicit val sp = s
        Multimodal.extractVideoFrameHashes(
          Multimodal.syntheticVideoGroups(
            Tables.documents(s, dir), "doc_id")).toDF()
      },
      Some(s"""$videoPhashCte
         |SELECT doc_id AS media_id, w AS width, h AS height,
         |  CAST(dhash AS BIGINT) AS dhash
         |FROM vph""".stripMargin)),

    // Video NEAR-DUP pairs under the WIDE 110-bit first-frame signature
    // — the image wide-pairs machinery on the video frame decode:
    // proportional two-word banding (13–14-bit keys), exact two-word
    // bit_count(xor) verify. Fixture groups of 4 are blue-channel
    // re-encode nudges; the oracle replays the frame hashes, the
    // vertical word, AND the wide banded candidacy. (Migrated off the
    // narrow 56-bit banding — 7-bit band keys measured exactly
    // quadratic at corpus scale, BASELINE.md round-15.)
    "llm_video_neardup" -> Q(
      (s, dir) => {
        implicit val sp = s
        val hashes = Multimodal.extractVideoFrameHashesWide(
          Multimodal.syntheticVideoGroups(
            Tables.documents(s, dir), "doc_id")).toDF()
        Dedup.hammingNearDupPairsWide(hashes, "media_id", "dhash", "vhash",
          nLoBits = 56, nHiBits = 54, maxHamming = 7)
      },
      Some(s"""$videoPhashCte,
         |$videoPhashWideCte,
         |vwbanded AS (${wideBandSlicesSql("vphw", "dhash", 56, "vhash", 54, 7)}),
         |vwcand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         |  a.dhash AS da, a.vhash AS va, c.dhash AS db, c.vhash AS vb
         |  FROM vwbanded a JOIN vwbanded c
         |  ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(da, db)) + bit_count(xor(va, vb)) AS INT)
         |    AS hamming
         |FROM vwcand
         |WHERE bit_count(xor(da, db)) + bit_count(xor(va, vb)) <= 7""".stripMargin)),

    // MOTION-JPEG first-frame perceptual hash: real AVI corpora carry
    // compressed '00dc' frames, not raw DIBs — this row certifies the
    // compressed path end to end: RIFF walk -> MJPG format contract ->
    // genuine JPEG decompression of the frame chunk -> the SAME
    // two-word dHash kernel as every other modality. JPEG is lossy, so
    // the oracle replays the fixture's DESIGNED cell values (h60
    // arithmetic, adjacent cells >= 20 apart vs a ~±3 bounded decode
    // error) — every hash bit deterministic by construction, while the
    // Spark side must actually decompress the pixels to reproduce it.
    "llm_video_mjpeg_phash" -> Q(
      (s, dir) => {
        implicit val sp = s
        Multimodal.extractVideoFrameHashesWide(
          Multimodal.syntheticVideoGroupsMjpeg(
            Tables.documents(s, dir), "doc_id")).toDF()
      },
      Some(s"""WITH ${mjpegPhashCtes(0L)}
         |SELECT doc_id AS media_id, CAST(72 AS INT) AS width,
         |  CAST(56 AS INT) AS height, dhash, vhash
         |FROM mphw""".stripMargin)),

    // MIXED-CODEC video near-dup: ONE wide banded pass over a corpus
    // whose videos are uncompressed-DIB AND Motion-JPEG AVIs (disjoint
    // id ranges) — the heterogeneous-codec shape a real 100 TB corpus
    // has. Both codecs flow through the same frame-hash extraction and
    // the same two-word banding; intra-MJPEG groups pair at hamming 0
    // (uniform-brightness re-encodes), DIB groups at their nudged
    // distances, and the decorrelated group salts keep cross-codec
    // collisions to chance. The oracle replays the DIB pixel chain,
    // the MJPEG designed-cell chain, the id-shifted union, and the
    // wide banded candidacy.
    "llm_video_mjpeg_neardup" -> Q(
      (s, dir) => {
        implicit val sp = s
        val docs = Tables.documents(s, dir)
        val dib = Multimodal.extractVideoFrameHashesWide(
          Multimodal.syntheticVideoGroups(docs, "doc_id")).toDF()
          .select(col("media_id"), col("dhash"), col("vhash"))
        val mj = Multimodal.extractVideoFrameHashesWide(
          Multimodal.syntheticVideoGroupsMjpeg(
            docs.select((col("doc_id") + 10000000L).as("doc_id")),
            "doc_id")).toDF()
          .select(col("media_id"), col("dhash"), col("vhash"))
        // CALLER-SIDE pin (round-19 paired sf10 A/B): per-frame ImageIO
        // JPEG decode is THE dominant kernel of this query, and the
        // banded self-join evaluates its input twice — pinning the
        // narrow post-decode frame here measured 3.06 vs 5.19 s at
        // sf0.1 and 20.1 vs 21.5 s at sf10 (win/wash), where the SAME
        // pin inside hammingNearDupPairsWide is a loss for the
        // cheap-kernel callers (see its scaladoc).
        Dedup.hammingNearDupPairsWide(
          graft.ops.Materialize.pin(dib.unionByName(mj)), "media_id",
          "dhash", "vhash", nLoBits = 56, nHiBits = 54, maxHamming = 7)
      },
      Some(s"""$videoPhashCte,
         |$videoPhashWideCte,
         |${mjpegPhashCtes(10000000L)},
         |uphw AS (SELECT doc_id, dhash, vhash FROM vphw
         |  UNION ALL SELECT doc_id, dhash, vhash FROM mphw),
         |uwbanded AS (${wideBandSlicesSql("uphw", "dhash", 56, "vhash", 54, 7)}),
         |uwcand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         |  a.dhash AS da, a.vhash AS va, c.dhash AS db, c.vhash AS vb
         |  FROM uwbanded a JOIN uwbanded c
         |  ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(xor(da, db)) + bit_count(xor(va, vb)) AS INT)
         |    AS hamming
         |FROM uwcand
         |WHERE bit_count(xor(da, db)) + bit_count(xor(va, vb)) <= 7""".stripMargin)),

    // Video near-dup at CORPUS scale: the write-time WIDE hamming index
    // over the 110-bit first-frame signatures, probed with the first 50
    // videos as the delta batch. Build decodes every corpus frame once
    // at write time; the probe decodes ONLY the delta and joins the
    // index on its partition columns (DPP-pruned read). The oracle
    // replays the frame-pixel hash chain, the vertical word, and the
    // wide banded candidacy, delta-oriented.
    "llm_video_index_probe_wide" -> Q(
      (s, dir) => {
        implicit val sp = s
        val fix = ensureVideoHashWideIndex(s, dir)
        val delta = Multimodal.extractVideoFrameHashesWide(
          Multimodal.syntheticVideoGroups(
            Tables.documents(s, dir).filter(col("doc_id") < 50),
            "doc_id")).toDF()
        Dedup.probeHammingWideIndex(s, fix, delta, "media_id", "dhash",
          "vhash", nLoBits = 56, nHiBits = 54, maxHamming = 7,
          nBuckets = Dedup.hammingWideIndexBuckets(s, fix))
      },
      Some(s"""$videoPhashCte,
         |$videoPhashWideCte,
         |vwbanded AS (${wideBandSlicesSql("vphw", "dhash", 56, "vhash", 54, 7)}),
         |vwcand AS (SELECT DISTINCT q.doc_id AS query_id, c.doc_id AS cand_id,
         |  q.dhash AS qd, q.vhash AS qv, c.dhash AS cd, c.vhash AS cv
         |  FROM vwbanded c JOIN vwbanded q
         |  ON c.band = q.band AND c.key = q.key AND c.doc_id <> q.doc_id
         |  WHERE q.doc_id < 50)
         |SELECT query_id, cand_id,
         |  CAST(bit_count(xor(qd, cd)) + bit_count(xor(qv, cv)) AS INT)
         |    AS hamming
         |FROM vwcand
         |WHERE bit_count(xor(qd, cd)) + bit_count(xor(qv, cv)) <= 7""".stripMargin)),

    // Video dedup clusters under the WIDE 110-bit signature — the
    // corpus-scale fix for the quadratic the narrow row measured at
    // sf10 (50.6x for 10x data: 7-bit band keys saturate at 500k
    // videos; BASELINE.md round-15). Horizontal + vertical first-frame
    // words -> 13-14-bit band keys -> candidate mass / ~2^7 at the same
    // pigeonhole recall; the cluster edge is the strictly-stronger
    // two-word hamming <= 7. The oracle replays the vertical word, the
    // proportional slicing, and the same recursive closure.
    "llm_video_dedup_clusters_wide" -> Q(
      (s, dir) => {
        implicit val sp = s
        val hashes = Multimodal.extractVideoFrameHashesWide(
          Multimodal.syntheticVideoGroups(
            Tables.documents(s, dir), "doc_id")).toDF()
        Dedup.dedupClusters(Dedup.hammingNearDupPairsWide(hashes,
          "media_id", "dhash", "vhash", nLoBits = 56, nHiBits = 54,
          maxHamming = 7))
      },
      Some(s"""${videoPhashCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |$videoPhashWideCte,
         |vwbanded AS (${wideBandSlicesSql("vphw", "dhash", 56, "vhash", 54, 7)}),
         |vwcand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         |  a.dhash AS da, a.vhash AS va, c.dhash AS db, c.vhash AS vb
         |  FROM vwbanded a JOIN vwbanded c
         |  ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id),
         |vwpairs AS (SELECT id_a, id_b FROM vwcand
         |  WHERE bit_count(xor(da, db)) + bit_count(xor(va, vb)) <= 7),
         |vwedges AS (SELECT id_a AS s, id_b AS d FROM vwpairs
         |  UNION ALL SELECT id_b, id_a FROM vwpairs),
         |vwreach AS (SELECT s, d FROM vwedges
         |  UNION SELECT r.s, e.d FROM vwreach r JOIN vwedges e ON r.d = e.s),
         |vwcl AS (SELECT s AS doc_id, least(s, min(d)) AS cluster_id
         |  FROM vwreach GROUP BY s)
         |SELECT doc_id, cluster_id FROM vwcl""".stripMargin)),

    // STRIDED video near-dup — the first-frame-evasion hardening: the
    // fixture's 4-frame AVIs scramble frame 0 per member (a re-encode
    // that replaced the opening frame), so first-frame hashing finds
    // NO intra-group pairs; hashing 3 evenly-strided frames and WIDE
    // banding over the two-word frame-hash SET (any in-budget frame
    // pair makes the videos candidates, reported at the min total
    // distance) recovers every group through the shared later frames
    // — at the corpus-scale 13–14-bit band keys. The oracle replays
    // the per-frame pixel hashes, the per-frame vertical words, the
    // wide banded candidacy over all (video, frame) rows, and the
    // per-pair min.
    "llm_video_strided_neardup" -> Q(
      (s, dir) => {
        implicit val sp = s
        val hashes = Multimodal.extractVideoFrameHashesStridedWide(
          Multimodal.syntheticVideoGroupsStrided(
            Tables.documents(s, dir), "doc_id"), k = 3).toDF()
        Dedup.hammingNearDupPairsSetWide(hashes, "media_id", "dhash",
          "vhash", nLoBits = 56, nHiBits = 54, maxHamming = 7)
      },
      Some(s"""$videoStridedPhashCte,
         |$videoStridedPhashWideCte,
         |vswbanded AS (${wideBandSlicesSql("vsphw", "dhash", 56, "vhash", 54, 7)}),
         |vswcand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         |  a.dhash AS da, a.vhash AS va, c.dhash AS db, c.vhash AS vb
         |  FROM vswbanded a JOIN vswbanded c
         |  ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id)
         |SELECT id_a, id_b,
         |  CAST(min(bit_count(xor(da, db)) + bit_count(xor(va, vb))) AS INT)
         |    AS hamming
         |FROM vswcand
         |WHERE bit_count(xor(da, db)) + bit_count(xor(va, vb)) <= 7
         |GROUP BY 1, 2""".stripMargin)),

    // STRIDED video near-dup at CORPUS scale: the write-time WIDE
    // hamming index holding the two-word frame-hash SET (one row per
    // strided frame — writeHammingWideIndex unchanged, it never assumed
    // one row per id), probed with the first 50 videos' own frame sets
    // and reduced to the per-pair min (Dedup.probeHammingWideIndexSet).
    // A first-frame layout misses every scrambled-frame-0 group this
    // fixture plants; the set layout recovers them through the shared
    // later frames — the pairs query's evasion closure on the index
    // path a 100 TB corpus would actually use, at full-entropy band
    // keys. The oracle replays the per-frame pixel hashes, the
    // per-frame vertical words, the wide banded candidacy over all
    // (video, frame) rows, and the per-pair min.
    "llm_video_strided_index_probe_wide" -> Q(
      (s, dir) => {
        implicit val sp = s
        val fix = ensureVideoStridedHashWideIndex(s, dir)
        val delta = Multimodal.extractVideoFrameHashesStridedWide(
          Multimodal.syntheticVideoGroupsStrided(
            Tables.documents(s, dir).filter(col("doc_id") < 50),
            "doc_id"), k = 3).toDF()
        Dedup.probeHammingWideIndexSet(s, fix, delta, "media_id", "dhash",
          "vhash", nLoBits = 56, nHiBits = 54, maxHamming = 7,
          nBuckets = Dedup.hammingWideIndexBuckets(s, fix))
      },
      Some(s"""$videoStridedPhashCte,
         |$videoStridedPhashWideCte,
         |vswbanded AS (${wideBandSlicesSql("vsphw", "dhash", 56, "vhash", 54, 7)}),
         |vswcand AS (SELECT DISTINCT q.doc_id AS query_id,
         |  c.doc_id AS cand_id, q.dhash AS qd, q.vhash AS qv,
         |  c.dhash AS cd, c.vhash AS cv
         |  FROM vswbanded c JOIN vswbanded q
         |  ON c.band = q.band AND c.key = q.key AND c.doc_id <> q.doc_id
         |  WHERE q.doc_id < 50)
         |SELECT query_id, cand_id,
         |  CAST(min(bit_count(xor(qd, cd)) + bit_count(xor(qv, cv))) AS INT)
         |    AS hamming
         |FROM vswcand
         |WHERE bit_count(xor(qd, cd)) + bit_count(xor(qv, cv)) <= 7
         |GROUP BY 1, 2""".stripMargin)),

    "llm_audio_resample" -> Q(
      (s, dir) => {
        implicit val sp = s
        val media = Multimodal.syntheticAudio(Tables.documents(s, dir), "doc_id")
        Multimodal.extractAudioContent(
          Multimodal.resampleAudioDs(media, targetRate = 12000)).toDF()
      },
      Some("""WITH par AS (SELECT doc_id, 8000*(1 + doc_id % 3) AS src,
         |  1 + doc_id % 2 AS ch, 200 + doc_id % 300 AS nin FROM documents),
         |p2 AS (SELECT *, ((nin-1)*12000)//src + 1 AS nout FROM par),
         |idx AS (SELECT doc_id, src, ch, nin, nout,
         |  unnest(range(0, nout*ch)) AS k FROM p2),
         |pos AS (SELECT doc_id, src, ch, nin, nout, (k % ch) AS c,
         |  ((k//ch)*src)//12000 AS p0, ((k//ch)*src) % 12000 AS frac
         |  FROM idx),
         |sm AS (SELECT doc_id, ch, nout, frac,
         |  ((doc_id*31 + p0*7 + c*13) % 65536 - 32768) AS s0,
         |  ((doc_id*31 + least(p0+1, nin-1)*7 + c*13) % 65536 - 32768) AS s1
         |  FROM pos),
         |o AS (SELECT doc_id, ch, nout,
         |  s0 + ((s1-s0)*frac)//12000 AS s FROM sm)
         |SELECT doc_id AS media_id,
         |  CAST(ch AS INT) AS channels,
         |  CAST(nout AS BIGINT) AS n_frames,
         |  CAST(sum(s*s) AS BIGINT) AS sum_sq,
         |  CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
         |  CAST(max(abs(s)) AS INT) AS peak_abs
         |FROM o GROUP BY 1, 2, 3""".stripMargin)),

    // Content-defined chunking: chunk boundaries at token positions
    // whose 3-gram hash ≡ 0 (mod 16) — content-local, so insertions
    // shift one chunk, not every later one (the dedup layout for
    // mutable corpora). Boundary decisions are stateless windowed-hash
    // tests (no sequential Rabin state), so the oracle replays the
    // exact boundary set and every chunk hash.
    "llm_cdc_chunks" -> Q(
      (s, dir) => Dedup.cdcChunks(Tables.documents(s, dir),
        "doc_id", "text", k = 3, divisor = 16),
      Some(s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
         |g AS (SELECT doc_id, ws, len(ws) AS n, ${gramsAllSql("ws")} AS gs
         |      FROM norm),
         |e AS (SELECT doc_id, n, CAST(unnest(range(0, len(gs))) AS INT) AS pos,
         |      unnest(list_transform(gs, s -> ${h60("s")})) AS h FROM g),
         |b AS (SELECT doc_id, n, pos AS start_tok FROM e
         |      WHERE pos > 0 AND h % 16 = 0
         |      UNION ALL SELECT doc_id, n, 0 FROM g),
         |c AS (SELECT doc_id, n, start_tok,
         |      CAST(row_number() OVER
         |        (PARTITION BY doc_id ORDER BY start_tok) AS INT) - 1
         |        AS chunk_idx,
         |      coalesce(lead(start_tok) OVER
         |        (PARTITION BY doc_id ORDER BY start_tok), n) AS end_tok
         |      FROM b)
         |SELECT c.doc_id,
         |  CAST(chunk_idx AS INT) AS chunk_idx,
         |  CAST(start_tok AS INT) AS start_tok,
         |  CAST(end_tok - start_tok AS INT) AS n_toks,
         |  ${h60("array_to_string(ws[start_tok+1:end_tok], ' ')")} AS chunk_h
         |FROM c JOIN g USING (doc_id)""".stripMargin)),

    // Chunk-level dedup stats — the KEEP/DROP measurement CDC feeds:
    // per doc, the fraction of its content-defined chunks whose hash
    // occurs anywhere else in the corpus. Insertion-robust twin of
    // llm_substring_dup at chunk granularity; shuffle ∝ chunks, not
    // grams.
    "llm_cdc_dedup" -> Q(
      (s, dir) => Dedup.cdcDedupStats(Tables.documents(s, dir),
        "doc_id", "text", k = 3, divisor = 16),
      Some(s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
         |g AS (SELECT doc_id, ws, len(ws) AS n, ${gramsAllSql("ws")} AS gs
         |      FROM norm),
         |e AS (SELECT doc_id, n, CAST(unnest(range(0, len(gs))) AS INT) AS pos,
         |      unnest(list_transform(gs, s -> ${h60("s")})) AS h FROM g),
         |b AS (SELECT doc_id, n, pos AS start_tok FROM e
         |      WHERE pos > 0 AND h % 16 = 0
         |      UNION ALL SELECT doc_id, n, 0 FROM g),
         |c AS (SELECT doc_id, n, start_tok,
         |      coalesce(lead(start_tok) OVER
         |        (PARTITION BY doc_id ORDER BY start_tok), n) AS end_tok
         |      FROM b),
         |ch AS (SELECT c.doc_id,
         |  ${h60("array_to_string(ws[start_tok+1:end_tok], ' ')")} AS chunk_h
         |  FROM c JOIN g USING (doc_id)),
         |cnt AS (SELECT chunk_h, count(*) AS cnt FROM ch GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_chunks,
         |  CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS dup_frac
         |FROM ch JOIN cnt USING (chunk_h) GROUP BY doc_id""".stripMargin)))
}
