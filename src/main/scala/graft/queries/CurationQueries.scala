package graft.queries

import org.apache.spark.sql.functions._

import graft.llm.{Curation, Dedup, TextAnalysis}
import graft.model.Tables
import graft.ops.Joins
import graft.ops.Materialize

/** Corpus-curation + scale-join queries: deterministic splits/samples,
  * token-budget sharding, benchmark decontamination, vocabulary top-k
  * (graft.llm.Curation), and the explicit skew/range join paths
  * (graft.ops.Joins.saltedJoin / rangeJoinBucketed).
  *
  * Oracle parity notes: every "random" choice is hash60 (MD5) of the id,
  * so the DuckDB twin reproduces it exactly; decimal sums cast to DOUBLE
  * at the output edge (fixed-scale Decimal vs shortest-repr double never
  * stringify alike).
  */
object CurationQueries {

  /** 60-bit md5 hash of a string SQL expression (DuckDB twin of
    * TextOps.hash60). */
  private def h60(e: String) =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  private def normSql(c: String) =
    s"regexp_replace(lower(trim($c)), '\\s+', ' ', 'g')"

  private def toksSql(c: String) = s"string_split(${normSql(c)}, ' ')"

  /** distinct word 3-shingles of token-list expression `ws` (DuckDB twin
    * of TextOps.wordShingles(k=3)). */
  private def shinglesSql(ws: String) =
    s"""list_distinct(CASE WHEN len($ws) - 2 >= 1
       |  THEN list_transform(range(1, len($ws) - 1),
       |         i -> array_to_string(($ws)[i:i+2], ' '))
       |  ELSE [array_to_string($ws, ' ')] END)""".stripMargin

  /** Shared oracle CTE for the trained quality classifier: replicates
    * trainQualityClassifier's ClfIters full-batch GD rounds EXACTLY —
    * binary hashed-gram features (+ bias bucket -1), the pinned
    * micro-unit sigmoid (verbatim parenthesization), exact long
    * gradient sums, and the rounded `grad * lr / n` update — so the
    * final weight table `w3 (b, u)` matches the Spark model
    * bit-for-bit. Every per-round CTE is MATERIALIZED (DuckDB inlines
    * plain CTEs; an unrolled 3-round chain would otherwise re-evaluate
    * the gram stream exponentially).
    */
  private[queries] lazy val clfCteSql: String = {
    val sig = (z: String) =>
      s"CAST(floor(1000000.0 / (1.0 + exp(-(CAST($z AS DOUBLE) / " +
        s"1000000.0))) + 0.5) AS BIGINT)"
    def round(i: Int, prevW: String): String = {
      val (z, e, w) = (s"z$i", s"e$i", s"w$i")
      val zDef =
        if (prevW.isEmpty)
          s"$z AS (SELECT doc_id, CAST(0 AS BIGINT) AS z FROM cy)"
        else
          s"""$z AS MATERIALIZED (SELECT f.doc_id,
             |  CAST(COALESCE(sum(u), 0) AS BIGINT) AS z
             |  FROM cfeats f LEFT JOIN $prevW USING (b) GROUP BY f.doc_id)""".stripMargin
      val wDef =
        if (prevW.isEmpty)
          s"""$w AS MATERIALIZED (SELECT b,
             |  0 - CAST(floor(CAST(sum(err) AS DOUBLE) * $ClfLr / n + 0.5)
             |    AS BIGINT) AS u
             |  FROM cfeats JOIN $e USING (doc_id) CROSS JOIN ctot
             |  GROUP BY b, n)""".stripMargin
        else
          s"""$w AS MATERIALIZED (SELECT b,
             |  u - CAST(floor(CAST(sum(err) AS DOUBLE) * $ClfLr / n + 0.5)
             |    AS BIGINT) AS u
             |  FROM cfeats JOIN $e USING (doc_id) JOIN $prevW USING (b)
             |  CROSS JOIN ctot GROUP BY b, u, n)""".stripMargin
      s"""$zDef,
         |$e AS MATERIALIZED (SELECT doc_id, ${sig("z")} - y * 1000000 AS err
         |  FROM $z JOIN cy USING (doc_id)),
         |$wDef""".stripMargin
    }
    s"""WITH cnorm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
       |cg0 AS (SELECT doc_id, unnest(list_concat(ws,
       |    list_transform(range(1, len(ws)),
       |      i -> ws[i] || ' ' || ws[i+1]))) AS g
       |  FROM cnorm),
       |cgb AS (SELECT DISTINCT doc_id, ${h60("g")} % 1024 AS b
       |  FROM cg0 WHERE g <> ''),
       |cfeats AS MATERIALIZED (SELECT doc_id, b FROM cgb
       |  UNION ALL SELECT doc_id, CAST(-1 AS BIGINT) FROM documents),
       |cy AS MATERIALIZED (SELECT doc_id,
       |  CASE WHEN list_contains(${toksSql("text")}, 'spark')
       |    THEN 1 ELSE 0 END AS y FROM documents),
       |ctot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM cy),
       |${round(1, "")},
       |${(2 to ClfIters).map(i => round(i, s"w${i - 1}")).mkString(",\n")}""".stripMargin
  }

  /** The classifier's pinned training config — one source of truth for
    * the Spark call AND the oracle's unrolled rounds. The (lr, iters)
    * point sits on the measured accuracy plateau for the marker-token
    * task (lr 4-6 x iters 8-12 all land 98.6-99.4% at sf0.01; smaller
    * rates collapse to the majority class, lone mid-range points
    * oscillate on the saturating sigmoid).
    */
  private[queries] val ClfIters = 10
  private val ClfLr = "4.0"

  /** Ensure the frozen BPE tokenizer artifact (3 greedy rules trained on
    * `dir`'s full documents) exists; return its path.
    */
  private[queries] def ensureBpeTokenizer(s: org.apache.spark.sql.SparkSession,
                                          dir: String): String = {
    val fix = "/tmp/graft_fixtures/bpe_v1_" +
      LlmQueries.fingerprintCached(s"$dir/documents.parquet")
    if (!new java.io.File(s"$fix/meta/_SUCCESS").exists())
      Curation.writeBpeTokenizer(Tables.documents(s, dir), "doc_id", "text",
        nMerges = 3, path = fix)
    fix
  }

  /** Ensure the frozen quality-classifier artifact for `dir`'s documents
    * exists; return its path (same contract as LlmQueries' ensure*
    * fixtures).
    */
  private[queries] def ensureClfModel(s: org.apache.spark.sql.SparkSession,
                                      dir: String): String = {
    val fix = "/tmp/graft_fixtures/clf_v1_" +
      LlmQueries.fingerprintCached(s"$dir/documents.parquet")
    if (!new java.io.File(s"$fix/meta/_SUCCESS").exists())
      Curation.writeQualityClassifier(
        Tables.documents(s, dir).withColumn("is_ref", array_contains(
          graft.llm.TextOps.tokens(col("text")), "spark").cast("int")),
        "doc_id", "text", "is_ref", fix,
        iters = ClfIters, lr = ClfLr.toDouble)
    fix
  }

  val all: Map[String, Q] = Map(

    // Salted equi-join: the explicit skew fallback. The salt mechanics
    // (explode right side across buckets, hash-salt left) must be
    // result-invisible: the oracle is the PLAIN join. 4 salt buckets —
    // enough to demonstrate the spread; the explode factor (x buckets on
    // the right side) is the op's inherent cost, sized to the skew being
    // split in production, not a fixed constant.
    "j4_salted_join" -> Q(
      (s, dir) => Joins.saltedJoin(
        Tables.lineitem(s, dir).withColumnRenamed("l_orderkey", "okey"),
        Tables.orders(s, dir).select(col("o_orderkey").as("okey"),
          col("o_orderstatus")),
        key = "okey", buckets = 4,
        saltCols = Seq("okey", "l_linenumber", "l_partkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty")),
      Some("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
             |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1""".stripMargin)),

    // Bucketed range join: orders priced into 40k-wide region bands via
    // the bucket-equi-join (no broadcast-nested-loop); residual BETWEEN
    // filter applies exact bounds. The oracle is the plain interval join.
    "j5_range_join_bucketed" -> Q(
      (s, dir) => {
        val bands = Tables.region(s, dir).select(col("r_name"),
          (col("r_regionkey").cast("long") * 40000L).as("lo"),
          (col("r_regionkey").cast("long") * 40000L + 39999L).as("hi"))
        val pts = Tables.orders(s, dir)
          .select(col("o_orderkey"), floor(col("o_totalprice")).as("p"))
        Joins.rangeJoinBucketed(pts, bands, "p", "lo", "hi", width = 10000L)
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n"), min(col("p")).as("min_p"),
            max(col("p")).as("max_p"))
      },
      Some("""SELECT r_name, CAST(count(*) AS BIGINT) AS n,
             |min(p) AS min_p, max(p) AS max_p
             |FROM (SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS p
             |      FROM orders) pts
             |JOIN (SELECT r_name, r_regionkey * 40000 AS lo,
             |             r_regionkey * 40000 + 39999 AS hi FROM region) bands
             |ON p >= lo AND p <= hi GROUP BY 1""".stripMargin)),

    // DSIR importance log-weights: every doc scored by how English-like
    // its hashed uni+bigram profile is (target = the lang='en' subset,
    // raw = the whole corpus; 1024 feature buckets, add-one smoothing).
    // Per-bucket log-ratios pin to micro-nats once; per-doc weights are
    // exact long sums, so the row hashes match bit-for-bit.
    "llm_dsir_weights" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Curation.dsirLogWeights(docs, docs.filter(col("lang") === "en"),
          "doc_id", "text")
      },
      Some(s"""WITH norm AS (SELECT doc_id, lang, ${toksSql("text")} AS ws
             |  FROM documents),
             |g0 AS (SELECT doc_id, lang, unnest(list_concat(ws,
             |    list_transform(range(1, len(ws)),
             |      i -> ws[i] || ' ' || ws[i+1]))) AS g
             |  FROM norm),
             |g AS (SELECT doc_id, lang, ${h60("g")} % 1024 AS b
             |  FROM g0 WHERE g <> ''),
             |crb AS (SELECT b, count(*) AS cr FROM g GROUP BY 1),
             |ctb AS (SELECT b, count(*) AS ct FROM g WHERE lang = 'en'
             |  GROUP BY 1),
             |tot AS (SELECT (SELECT count(*) FROM g) AS nr,
             |        (SELECT count(*) FROM g WHERE lang = 'en') AS nt),
             |lam AS (SELECT b, CAST(floor(ln(
             |    CAST((COALESCE(ct, 0) + 1) * (nr + 1024) AS DOUBLE) /
             |    CAST((cr + 1) * (nt + 1024) AS DOUBLE)) * 1e6 + 0.5)
             |    AS BIGINT) AS u
             |  FROM crb LEFT JOIN ctb USING (b) CROSS JOIN tot)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             |  CAST(sum(u) AS BIGINT) AS logw_units,
             |  CAST(sum(u) AS DOUBLE) / 1e6 AS log_weight
             |FROM g JOIN lam USING (b) GROUP BY doc_id""".stripMargin)),

    // DSIR end-to-end: importance weights -> keep probability
    // exp(logw - max_logw) -> the deterministic score-proportional
    // sampler (salt "qw:"). The max re-bases weights so the best doc
    // keeps with probability exactly 1; everything downstream is the
    // pinned clamp/floor ppm rule, replicated verbatim.
    "llm_dsir_resample" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val w = Curation.dsirLogWeights(docs,
          docs.filter(col("lang") === "en"), "doc_id", "text")
          .transform(Materialize.pin)
        val mx = w.agg(max(col("logw_units"))).head().getLong(0)
        val scored = w.withColumn("score",
          exp((col("logw_units") - lit(mx)).cast("double") / lit(1e6)))
        Curation.scoreWeightedSample(scored, "doc_id", "score")
          .select(col("doc_id"), col("n_grams"), col("logw_units"))
      },
      Some(s"""WITH norm AS (SELECT doc_id, lang, ${toksSql("text")} AS ws
             |  FROM documents),
             |g0 AS (SELECT doc_id, lang, unnest(list_concat(ws,
             |    list_transform(range(1, len(ws)),
             |      i -> ws[i] || ' ' || ws[i+1]))) AS g
             |  FROM norm),
             |g AS (SELECT doc_id, lang, ${h60("g")} % 1024 AS b
             |  FROM g0 WHERE g <> ''),
             |crb AS (SELECT b, count(*) AS cr FROM g GROUP BY 1),
             |ctb AS (SELECT b, count(*) AS ct FROM g WHERE lang = 'en'
             |  GROUP BY 1),
             |tot AS (SELECT (SELECT count(*) FROM g) AS nr,
             |        (SELECT count(*) FROM g WHERE lang = 'en') AS nt),
             |lam AS (SELECT b, CAST(floor(ln(
             |    CAST((COALESCE(ct, 0) + 1) * (nr + 1024) AS DOUBLE) /
             |    CAST((cr + 1) * (nt + 1024) AS DOUBLE)) * 1e6 + 0.5)
             |    AS BIGINT) AS u
             |  FROM crb LEFT JOIN ctb USING (b) CROSS JOIN tot),
             |doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             |  CAST(sum(u) AS BIGINT) AS logw_units
             |  FROM g JOIN lam USING (b) GROUP BY doc_id),
             |mx AS (SELECT max(logw_units) AS m FROM doc)
             |SELECT doc_id, n_grams, logw_units FROM doc CROSS JOIN mx
             |WHERE ${h60("'qw:' || CAST(doc_id AS VARCHAR)")} % 1000000 <
             |  floor(least(greatest(
             |    exp(CAST(logw_units - m AS DOUBLE) / 1e6), 0.0), 1.0)
             |    * 1e6)""".stripMargin)),

    // Trained quality classifier (fastText/CCNet-style): logistic
    // regression over hashed unigram+bigram presence features, ClfIters
    // full-batch GD rounds. Label: the doc mentions the
    // reference-domain marker token ("spark") — a deterministic,
    // text-derived stand-in for "reference corpus vs crawl" with real
    // signal in the features (the fixture's lang/source columns are
    // assigned independently of the text, so a metadata label would be
    // unlearnable by construction). The whole training loop is exact
    // integer dataflow (micro-unit weights/sigmoid/gradients), so the
    // oracle reproduces the MODEL bit-for-bit — not just the scores.
    "llm_quality_clf_train" -> Q(
      (s, dir) => Curation.trainQualityClassifier(
        Tables.documents(s, dir)
          .withColumn("is_ref", array_contains(
            graft.llm.TextOps.tokens(col("text")), "spark").cast("int")),
        "doc_id", "text", "is_ref", iters = ClfIters, lr = ClfLr.toDouble),
      Some(s"""$clfCteSql
             |SELECT b, u AS w_units FROM w$ClfIters""".stripMargin)),

    // ...and the filter it exists for: score every doc with the trained
    // weights (exact long logit; pred = keep). Broadcast model join +
    // one per-doc aggregation — the 100 TB filter is one linear pass.
    "llm_quality_clf_score" -> Q(
      (s, dir) => {
        // Score against the FROZEN artifact (ensureClfModel — built once
        // per content fingerprint, in Bench warmup): training is
        // deterministic, so the memoized weights are bit-identical to an
        // inline retrain and the oracle replays the training unchanged.
        // Same shape as the r6 prepareIndexes fix for the ANN probes —
        // the timed body is the scoring pass only, no GD rounds.
        val docs = Tables.documents(s, dir)
        val model = s.read.parquet(s"${ensureClfModel(s, dir)}/weights")
        Curation.scoreQualityClassifier(docs, model, "doc_id", "text")
      },
      Some(s"""$clfCteSql,
             |zf AS (SELECT f.doc_id, CAST(COALESCE(sum(u), 0) AS BIGINT) AS z
             |  FROM cfeats f LEFT JOIN w$ClfIters USING (b)
             |  GROUP BY f.doc_id)
             |SELECT doc_id, z AS score_units,
             |  CAST(CASE WHEN z > 0 THEN 1 ELSE 0 END AS INT) AS pred
             |FROM zf""".stripMargin)),

    // Fractional-epoch token-budget mixture: five "high-quality"
    // sources get 2.5x their token mass (2 full epochs + a partial),
    // the rest 0.4x (pure downsample) — the Llama-style mixture step
    // where repeats and downsampling are one plan. The oracle
    // replicates the per-domain plan arithmetic and the hash-ordered
    // greedy partial fill with a single per-domain window (the
    // two-phase prefix sum order-embeds into it exactly).
    "llm_epoch_mix" -> Q(
      (s, dir) => {
        val toks = Tables.documents(s, dir).select(col("doc_id"),
          col("source"),
          size(graft.llm.TextOps.tokens(col("text"))).cast("long")
            .as("ntok"))
        val hi = Seq("src0", "src1", "src2", "src3", "src4")
        val budgets = toks.groupBy(col("source"))
          .agg(sum(col("ntok")).as("tt"))
          .select(col("source"),
            floor(col("tt").cast("double") *
              when(col("source").isin(hi: _*), lit(2.5))
                .otherwise(lit(0.4))).cast("long").as("budget"))
        Curation.epochMix(toks, "doc_id", "ntok", "source", budgets)
      },
      Some(s"""WITH tok AS (SELECT doc_id, source AS domain,
             |    CAST(len(${toksSql("text")}) AS BIGINT) AS ntok,
             |    ${h60("'ep:' || CAST(doc_id AS VARCHAR)")} AS h
             |  FROM documents),
             |tot AS (SELECT domain, CAST(sum(ntok) AS BIGINT) AS tt
             |  FROM tok GROUP BY domain),
             |bud AS (SELECT domain, CAST(floor(CAST(tt AS DOUBLE) *
             |    CASE WHEN domain IN ('src0','src1','src2','src3','src4')
             |    THEN 2.5 ELSE 0.4 END) AS BIGINT) AS budget FROM tot),
             |pl AS (SELECT t.domain,
             |    CAST(floor(CAST(budget AS DOUBLE) / CAST(tt AS DOUBLE))
             |      AS BIGINT) AS ne,
             |    budget - CAST(floor(CAST(budget AS DOUBLE) /
             |      CAST(tt AS DOUBLE)) AS BIGINT) * tt AS rem
             |  FROM tot t JOIN bud USING (domain)),
             |cum AS (SELECT doc_id, domain, ntok,
             |    CAST(sum(ntok) OVER (PARTITION BY domain ORDER BY h, doc_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS gcum
             |  FROM tok)
             |SELECT doc_id, domain AS source,
             |  CAST(epoch AS BIGINT) AS epoch, ntok AS n_tokens
             |FROM (SELECT doc_id, domain, ntok, unnest(range(0, ne)) AS epoch
             |      FROM cum JOIN pl USING (domain)) f
             |UNION ALL
             |SELECT doc_id, domain AS source,
             |  CAST(ne AS BIGINT) AS epoch, ntok AS n_tokens
             |FROM cum JOIN pl USING (domain) WHERE gcum <= rem""".stripMargin)),

    // ...and the evaluation: exact ROC-AUC of the trained scorer on the
    // labeled set (Mann-Whitney with average tie ranks, half-unit
    // integer arithmetic). The data-sized pass is one aggregate by
    // score; the ordered cumulative runs over the distinct-score frame.
    "llm_clf_auc" -> Q(
      (s, dir) => {
        // Evaluate the FROZEN artifact (see llm_quality_clf_score): the
        // timed body is score + rank statistic, no GD rounds.
        val docs = Tables.documents(s, dir)
          .withColumn("is_ref", array_contains(
            graft.llm.TextOps.tokens(col("text")), "spark").cast("int"))
        val model = s.read.parquet(s"${ensureClfModel(s, dir)}/weights")
        val scored = Curation.scoreQualityClassifier(docs, model,
          "doc_id", "text")
          .join(docs.select(col("doc_id"), col("is_ref")), Seq("doc_id"))
        Curation.binaryAuc(scored, "score_units", "is_ref")
      },
      Some(s"""$clfCteSql,
             |zf AS (SELECT f.doc_id, CAST(COALESCE(sum(u), 0) AS BIGINT) AS z
             |  FROM cfeats f LEFT JOIN w$ClfIters USING (b)
             |  GROUP BY f.doc_id),
             |sc AS (SELECT z AS s, y FROM zf JOIN cy USING (doc_id)),
             |bs AS (SELECT s, CAST(sum(y) AS BIGINT) AS np,
             |    CAST(sum(1 - y) AS BIGINT) AS nn FROM sc GROUP BY s),
             |cm AS (SELECT s, np, nn,
             |    CAST(COALESCE(sum(nn) OVER (ORDER BY s
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS cumneg
             |  FROM bs)
             |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
             |  CAST(sum(nn) AS BIGINT) AS n_neg,
             |  CAST(sum(np * (2 * cumneg + nn)) AS BIGINT)
             |    AS auc_num_halfunits,
             |  CAST(sum(np * (2 * cumneg + nn)) AS DOUBLE) /
             |    (2.0 * CAST(sum(np) AS DOUBLE) * CAST(sum(nn) AS DOUBLE))
             |    AS auc
             |FROM cm""".stripMargin)),

    // Streaming trained-classifier ingest gate (the 5th gate), batch
    // form: arriving docs score against the FROZEN classifier artifact;
    // accept = positive logit. Unchanged re-ids (%10==0) keep their
    // marker status; marker-stripped twins (%10==1, 'spark' tokens
    // removed) lose the signal the model keys on and are rejected. The
    // oracle is a FULL replay — retrain the model in SQL, re-featurize
    // the arriving set, score against the final weight table.
    "llm_stream_clf_gate" -> Q(
      (s, dir) => {
        val fix = ensureClfModel(s, dir)
        val docs = Tables.documents(s, dir)
        val arriving = docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
          .unionByName(docs.filter(col("doc_id") % 10 === 1)
            .select((col("doc_id") + 6000000L).as("doc_id"),
              concat_ws(" ", filter(graft.llm.TextOps.tokens(col("text")),
                t => t =!= "spark")).as("text")))
        Curation.clfGateBatch(s, fix, arriving, "doc_id", "text")
      },
      Some(s"""$clfCteSql,
             |arr AS (SELECT doc_id + 5000000 AS doc_id, ws FROM cnorm
             |    WHERE doc_id % 10 = 0
             |  UNION ALL SELECT doc_id + 6000000 AS doc_id,
             |    list_filter(ws, t -> t <> 'spark') AS ws FROM cnorm
             |    WHERE doc_id % 10 = 1),
             |ag0 AS (SELECT doc_id, unnest(list_concat(ws,
             |    list_transform(range(1, len(ws)),
             |      i -> ws[i] || ' ' || ws[i+1]))) AS g
             |  FROM arr),
             |agb AS (SELECT DISTINCT doc_id, ${h60("g")} % 1024 AS b
             |  FROM ag0 WHERE g <> ''),
             |afeat AS (SELECT doc_id, b FROM agb
             |  UNION ALL SELECT doc_id, CAST(-1 AS BIGINT) FROM arr),
             |az AS (SELECT f.doc_id, CAST(COALESCE(sum(u), 0) AS BIGINT) AS z
             |  FROM afeat f LEFT JOIN w$ClfIters USING (b)
             |  GROUP BY f.doc_id)
             |SELECT doc_id, z AS score_units FROM az WHERE z > 0""".stripMargin)),

    // Blocked fuzzy join (entity resolution): part names vs a dirty
    // twin catalog — even keys lose their 2nd character (prefix block
    // broken, suffix catches), odd keys lose their 2nd-to-last (suffix
    // broken, prefix catches) — so BOTH blocking keys are load-bearing
    // in the recall. Candidates form only inside a block (equi-shuffle,
    // never n x m); the codegen'd levenshtein sees only length-plausible
    // same-block pairs. The oracle replicates blocking + DuckDB's own
    // levenshtein, so agreement checks the candidate generation AND the
    // edit-distance kernel across engines.
    "j7_fuzzy_join" -> Q(
      (s, dir) => {
        // Master catalog: one canonical row per distinct name (the part
        // table repeats few names many times — matching raw-vs-raw would
        // be quadratic in the duplicate-group size; master-vs-records is
        // the standard linear ER shape).
        val master = Tables.part(s, dir)
          .groupBy(col("p_name"))
          .agg(min(col("p_partkey")).as("m_key"))
        val dirty = Tables.part(s, dir).select(
          (col("p_partkey") + 1000000L).as("d_key"),
          when(col("p_partkey") % 2 === 0,
            expr("concat(substring(p_name, 1, 1), substring(p_name, 3))"))
            .otherwise(expr(
              "concat(substring(p_name, 1, length(p_name) - 2), " +
                "substring(p_name, length(p_name), 1))"))
            .as("d_name"))
        Joins.fuzzyJoinBlocked(master, dirty, "m_key", "p_name",
          "d_key", "d_name", maxDistance = 1)
          .select(col("id_a"), col("id_b"), col("dist"))
      },
      Some("""WITH a0 AS (SELECT min(p_partkey) AS id_a,
             |  lower(trim(p_name)) AS t_a FROM part GROUP BY p_name),
             |b0 AS (SELECT p_partkey + 1000000 AS id_b,
             |  lower(trim(CASE WHEN p_partkey % 2 = 0
             |    THEN substr(p_name, 1, 1) || substr(p_name, 3)
             |    ELSE substr(p_name, 1, length(p_name) - 2) ||
             |         substr(p_name, length(p_name), 1) END)) AS t_b
             |  FROM part),
             |ka AS (SELECT id_a, 'p:' || substr(t_a, 1, 3) AS bkey FROM a0
             |  UNION ALL SELECT id_a,
             |    's:' || substr(t_a, greatest(length(t_a) - 2, 1), 3) FROM a0),
             |kb AS (SELECT id_b, 'p:' || substr(t_b, 1, 3) AS bkey FROM b0
             |  UNION ALL SELECT id_b,
             |    's:' || substr(t_b, greatest(length(t_b) - 2, 1), 3) FROM b0),
             |cand AS (SELECT DISTINCT id_a, id_b FROM ka JOIN kb USING (bkey))
             |SELECT id_a, id_b, CAST(levenshtein(t_a, t_b) AS INT) AS dist
             |FROM cand JOIN a0 USING (id_a) JOIN b0 USING (id_b)
             |WHERE abs(length(t_a) - length(t_b)) <= 1
             |  AND levenshtein(t_a, t_b) <= 1""".stripMargin)),

    // End-to-end entity resolution: the guarded fuzzy join's pair graph
    // closed into entities. Master catalog + dirty twin (the j7 fixture)
    // feed fuzzyJoinBlocked; the resulting (master, record) pair graph
    // goes through dedupClusters (min-label closure with pointer
    // jumping), so a master whose dirty variants also collide with a
    // NEIGHBOR master's variants merges into one entity — transitive
    // resolution, not per-pair matching. Nodes untouched by any pair
    // are singleton entities (left join + coalesce, not dropped).
    // Output: one row per resolved entity with member composition —
    // the shape an MDM/dedup consumer reads. The oracle replicates
    // blocking + levenshtein + a WITH RECURSIVE reachability closure,
    // so candidate generation, the edit kernel, AND the closure all
    // cross-check against a second engine.
    "j8_entity_resolution" -> Q(
      (s, dir) => {
        val master = Tables.part(s, dir)
          .groupBy(col("p_name"))
          .agg(min(col("p_partkey")).as("m_key"))
        val dirty = Tables.part(s, dir).select(
          (col("p_partkey") + 1000000L).as("d_key"),
          when(col("p_partkey") % 2 === 0,
            expr("concat(substring(p_name, 1, 1), substring(p_name, 3))"))
            .otherwise(expr(
              "concat(substring(p_name, 1, length(p_name) - 2), " +
                "substring(p_name, length(p_name), 1))"))
            .as("d_name"))
        val pairs = Joins.fuzzyJoinBlocked(master, dirty, "m_key", "p_name",
          "d_key", "d_name", maxDistance = 1)
        val clusters = Dedup.dedupClusters(pairs.select("id_a", "id_b"))
        val nodes = master.select(col("m_key").as("id"))
          .unionAll(dirty.select(col("d_key").as("id")))
        nodes.join(clusters, nodes("id") === clusters("doc_id"), "left")
          .select(col("id"),
            coalesce(col("cluster_id"), col("id")).as("entity_id"))
          .groupBy(col("entity_id"))
          .agg(
            sum(when(col("id") < 1000000L, 1L).otherwise(0L)).as("n_masters"),
            sum(when(col("id") >= 1000000L, 1L).otherwise(0L))
              .as("n_records"),
            count(lit(1)).as("n_members"))
      },
      Some("""WITH RECURSIVE a0 AS (SELECT min(p_partkey) AS id_a,
             |  lower(trim(p_name)) AS t_a FROM part GROUP BY p_name),
             |b0 AS (SELECT p_partkey + 1000000 AS id_b,
             |  lower(trim(CASE WHEN p_partkey % 2 = 0
             |    THEN substr(p_name, 1, 1) || substr(p_name, 3)
             |    ELSE substr(p_name, 1, length(p_name) - 2) ||
             |         substr(p_name, length(p_name), 1) END)) AS t_b
             |  FROM part),
             |ka AS (SELECT id_a, 'p:' || substr(t_a, 1, 3) AS bkey FROM a0
             |  UNION ALL SELECT id_a,
             |    's:' || substr(t_a, greatest(length(t_a) - 2, 1), 3) FROM a0),
             |kb AS (SELECT id_b, 'p:' || substr(t_b, 1, 3) AS bkey FROM b0
             |  UNION ALL SELECT id_b,
             |    's:' || substr(t_b, greatest(length(t_b) - 2, 1), 3) FROM b0),
             |cand AS (SELECT DISTINCT id_a, id_b FROM ka JOIN kb USING (bkey)),
             |pairs AS (SELECT id_a, id_b
             |  FROM cand JOIN a0 USING (id_a) JOIN b0 USING (id_b)
             |  WHERE abs(length(t_a) - length(t_b)) <= 1
             |    AND levenshtein(t_a, t_b) <= 1),
             |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
             |  UNION ALL SELECT id_b, id_a FROM pairs),
             |reach AS (SELECT s, d FROM edges
             |  UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
             |cl AS (SELECT s AS id, least(s, min(d)) AS entity_id
             |  FROM reach GROUP BY s),
             |nodes AS (SELECT id_a AS id FROM a0
             |  UNION ALL SELECT id_b FROM b0),
             |ent AS (SELECT n.id, COALESCE(cl.entity_id, n.id) AS entity_id
             |  FROM nodes n LEFT JOIN cl ON n.id = cl.id)
             |SELECT entity_id,
             |  CAST(sum(CASE WHEN id < 1000000 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_masters,
             |  CAST(sum(CASE WHEN id >= 1000000 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_records,
             |  CAST(count(*) AS BIGINT) AS n_members
             |FROM ent GROUP BY entity_id""".stripMargin)),

    // Context-window chunking: 40-token chunks, 8-token overlap
    // (stride 32). Chunk count, boundaries, and text are pure functions
    // of the normalized token array, replicated exactly in DuckDB via
    // list slicing — chunk_text hashes must match verbatim.
    "llm_chunk" -> Q(
      (s, dir) => Curation.chunkByTokens(Tables.documents(s, dir),
        "doc_id", "text", chunkTokens = 40, overlap = 8),
      Some("""WITH t AS (SELECT doc_id, %TOKS% AS ws FROM documents),
             |c AS (SELECT doc_id, ws, len(ws) AS n,
             |  CASE WHEN len(ws) <= 40 THEN 1
             |       ELSE CAST(floor((len(ws) - 40 + 31) / 32.0) AS INT) + 1 END AS nc
             |  FROM t),
             |k AS (SELECT doc_id, ws, n, unnest(range(0, nc)) AS k FROM c)
             |SELECT doc_id, CAST(k AS INT) AS chunk_id,
             |  CAST(least(40, n - k * 32) AS INT) AS n_tokens,
             |  array_to_string(ws[(k * 32 + 1):(k * 32 + 40)], ' ') AS chunk_text
             |FROM k""".stripMargin
        .replace("%TOKS%", toksSql("text")))),

    // Deterministic 80/10/10 split: split membership is a pure function
    // of hash60(doc_id) — rerun/engine/partitioning invariant.
    "llm_split_hash" -> Q(
      (s, dir) => Curation.hashSplit(Tables.documents(s, dir), "doc_id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select(col("doc_id"), col("split")),
      Some(s"""SELECT doc_id,
              |CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
              |     ELSE 'test' END AS split
              |FROM (SELECT doc_id,
              |  ${h60("CAST(doc_id AS VARCHAR)")} % 100 AS b
              |  FROM documents)""".stripMargin)),

    // Fixed-rate domain mix: per-language keep rates (en full, zh 40%,
    // es 25%, everything else 10%), decided by the salted hash — a pure
    // scan-stage filter, zero shuffle. The salt ("mix:") decorrelates it
    // from llm_split_hash's buckets.
    "llm_domain_mix" -> Q(
      (s, dir) => Curation.domainMixSample(Tables.documents(s, dir),
        "doc_id", "lang",
        Map("en" -> 1.0, "zh" -> 0.4, "es" -> 0.25), defaultWeight = 0.1)
        .select(col("doc_id"), col("lang"), col("source")),
      Some(s"""SELECT doc_id, lang, source FROM documents
              |WHERE ${h60("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000000 <
              |  CASE lang WHEN 'en' THEN 1000000 WHEN 'zh' THEN 400000
              |       WHEN 'es' THEN 250000 ELSE 100000 END""".stripMargin)),

    // Target-share resample: largest corpus at exactly 50/30/20
    // en/zh/es (de/fr dropped). Rates derive from per-domain counts via
    // the pinned t*S/n*1e6 double sequence, so the oracle recomputes
    // bit-identical ppm thresholds from its own counts. Distinct salt
    // ("mixprop:") so composing with llm_domain_mix thins independently;
    // the binding domain (n/t = S) pins to exactly 1e6 ppm on BOTH sides
    // (floor(t*S/n*1e6) can land on 999999 and shave kept-whole rows).
    "llm_mix_proportions" -> Q(
      (s, dir) => Curation.mixToProportions(Tables.documents(s, dir),
        "doc_id", "lang", Map("en" -> 0.5, "zh" -> 0.3, "es" -> 0.2))
        .select(col("doc_id"), col("lang"), col("source")),
      Some(s"""WITH counts AS (
              |  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
              |    CASE lang WHEN 'en' THEN CAST(0.5 AS DOUBLE)
              |         WHEN 'zh' THEN CAST(0.3 AS DOUBLE)
              |         WHEN 'es' THEN CAST(0.2 AS DOUBLE) END AS t
              |  FROM documents GROUP BY lang),
              |s AS (SELECT min(n / t) AS S FROM counts WHERE t IS NOT NULL),
              |rates AS (SELECT lang,
              |    CASE WHEN n / t = S THEN CAST(1000000 AS BIGINT)
              |         ELSE CAST(floor(t * S / n * 1e6) AS BIGINT)
              |    END AS ppm
              |  FROM counts CROSS JOIN s WHERE t IS NOT NULL)
              |SELECT doc_id, lang, source
              |FROM documents JOIN rates USING (lang)
              |WHERE ${h60("'mixprop:' || CAST(doc_id AS VARCHAR)")} % 1000000
              |  < ppm""".stripMargin)),

    // Per-language quota sample: at most 400 docs per lang, picked by
    // deterministic hash order (not first-seen, which is partitioning-
    // dependent).
    "llm_quota_sample" -> Q(
      (s, dir) => Curation.quotaSample(Tables.documents(s, dir),
        "lang", "doc_id", quota = 400)
        .select(col("doc_id"), col("lang")),
      Some(s"""SELECT doc_id, lang FROM (
              |  SELECT doc_id, lang, row_number() OVER
              |    (PARTITION BY lang
              |     ORDER BY ${h60("CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
              |  FROM documents) WHERE rn <= 400""".stripMargin)),

    // Token-budget sharding: ~20k tokens per training shard in the
    // deterministic hash order. The Spark side is the two-phase prefix
    // sum; the oracle is the straightforward global window (fine for an
    // oracle, wrong for 100 TB) — they must agree exactly.
    "llm_pack_shards" -> Q(
      (s, dir) => Curation.packByTokenBudget(
        Tables.documents(s, dir)
          .select(col("doc_id"),
            size(graft.llm.TextOps.tokens(col("text"))).as("n_tokens")),
        "doc_id", "n_tokens", budget = 20000L)
        .select(col("doc_id"), col("n_tokens"), col("shard")),
      Some(s"""SELECT doc_id, n_tokens,
              |CAST(floor(COALESCE(sum(n_tokens) OVER
              |  (ORDER BY h, doc_id
              |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |  / 20000) AS BIGINT) AS shard
              |FROM (SELECT doc_id,
              |        CAST(len(${toksSql("text")}) AS INT) AS n_tokens,
              |        ${h60("CAST(doc_id AS VARCHAR)")} AS h
              |      FROM documents)""".stripMargin)),

    // Benchmark decontamination: documents sharing any word 3-shingle
    // with the benchmark slice (doc_id % 97 = 0) are dropped; survivors
    // listed. Semi-join on shingle hash + anti-join on id — never
    // pairwise.
    "llm_decontaminate" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val bench = docs.filter(col("doc_id") % 97 === 0)
        val corpus = docs.filter(col("doc_id") % 97 =!= 0)
        Curation.decontaminate(corpus, bench, "doc_id", "text", shingleK = 3)
          .select(col("doc_id"), col("lang"))
      },
      Some(s"""WITH sh AS (SELECT doc_id,
              |  unnest(${shinglesSql(toksSql("text"))}) AS s0 FROM documents),
              |hs AS (SELECT doc_id, ${h60("s0")} AS s FROM sh),
              |bench AS (SELECT DISTINCT s FROM hs WHERE doc_id % 97 = 0),
              |bad AS (SELECT DISTINCT doc_id FROM hs
              |        WHERE doc_id % 97 <> 0
              |          AND s IN (SELECT s FROM bench))
              |SELECT doc_id, lang FROM documents
              |WHERE doc_id % 97 <> 0
              |  AND doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin)),

    // Bloom-prefiltered decontamination: same semantics as
    // llm_decontaminate (different benchmark slice, doc_id % 89), but the
    // corpus shingles pass a broadcast graft_bloom prefilter BEFORE the
    // semi-join Exchange — the 100 TB runtime-filter shape. Bloom false
    // positives are removed by the exact semi-join, so the oracle is the
    // PLAIN decontamination SQL: an exact hash check that the prefilter
    // is result-invisible.
    "llm_decontaminate_bloom" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val bench = docs.filter(col("doc_id") % 89 === 0)
        val corpus = docs.filter(col("doc_id") % 89 =!= 0)
        Curation.decontaminateBloom(corpus, bench, "doc_id", "text",
            shingleK = 3, bloomBits = 1 << 17, bloomHashes = 7)
          .select(col("doc_id"), col("lang"))
      },
      Some(s"""WITH sh AS (SELECT doc_id,
              |  unnest(${shinglesSql(toksSql("text"))}) AS s0 FROM documents),
              |hs AS (SELECT doc_id, ${h60("s0")} AS s FROM sh),
              |bench AS (SELECT DISTINCT s FROM hs WHERE doc_id % 89 = 0),
              |bad AS (SELECT DISTINCT doc_id FROM hs
              |        WHERE doc_id % 89 <> 0
              |          AND s IN (SELECT s FROM bench))
              |SELECT doc_id, lang FROM documents
              |WHERE doc_id % 89 <> 0
              |  AND doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin)),

    // NEAR-dup decontamination: the paraphrase edition — a corpus doc
    // is dropped only when its whole-document shingle Jaccard vs some
    // benchmark doc clears 0.5 (the exact variants above drop on ANY
    // shared shingle — verbatim-leak semantics; this catches the
    // REWORDED eval question without over-dropping docs that merely
    // share a phrase). Candidates via the cross-corpus minhash band
    // join (benchmark side broadcast, no corpus-wide shuffle); the
    // oracle replays the full signature/band/Jaccard chain — same
    // CTE shape as llm_neardup_index_probe.
    "llm_decontaminate_neardup" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val bench = docs.filter(col("doc_id") % 97 === 0)
        val corpus = docs.filter(col("doc_id") % 97 =!= 0)
        Curation.decontaminateNearDup(corpus, bench, "doc_id", "text",
          shingleK = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
          .select(col("doc_id"), col("lang"))
      },
      Some {
        val P = graft.llm.TextOps.MinhashP
        val mins = (0 until 16).map { i =>
          val (a, b) = graft.llm.TextOps.minhashParams(i)
          s"list_min(list_transform(hs, h -> ($a * h + $b) % $P))"
        }.mkString("[", ", ", "]")
        s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
           |shd AS (SELECT doc_id, ${shinglesSql("ws")} AS sh FROM norm),
           |hsd AS (SELECT doc_id, sh,
           |  list_transform(sh, s -> ${h60("s")} % $P) AS hs FROM shd),
           |sig AS (SELECT doc_id, sh, $mins AS sig FROM hsd),
           |banded AS (SELECT doc_id, sh, b.band,
           |  array_to_string(sig[b.band*2+1:b.band*2+2], '_') AS bkey
           |  FROM sig, (SELECT unnest(range(0, 8)) AS band) b),
           |cand AS (SELECT DISTINCT t.doc_id AS tid, t.sh AS ts, c.sh AS bs
           |  FROM banded t JOIN banded c
           |  ON t.band = c.band AND t.bkey = c.bkey
           |  WHERE t.doc_id % 97 <> 0 AND c.doc_id % 97 = 0),
           |bad AS (SELECT DISTINCT tid FROM cand
           |  WHERE len(list_intersect(ts, bs))::DOUBLE /
           |    (len(ts) + len(bs) - len(list_intersect(ts, bs)))::DOUBLE >= 0.5)
           |SELECT doc_id, lang FROM documents
           |WHERE doc_id % 97 <> 0
           |  AND doc_id NOT IN (SELECT tid FROM bad)""".stripMargin
      }),

    // TF-IDF-style term relevance (log-free: tf * N / df, every op
    // exactly-rounded IEEE, so even the double score hash-matches).
    "llm_tfidf" -> Q(
      (s, dir) => graft.llm.TextAnalysis.termRelevance(
        Tables.documents(s, dir), "doc_id", "text"),
      Some(s"""WITH toks AS (SELECT doc_id, t AS token
              |  FROM (SELECT doc_id, unnest(${toksSql("text")}) AS t
              |        FROM documents) WHERE t <> ''),
              |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
              |  FROM toks GROUP BY 1, 2),
              |dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
              |  FROM tf GROUP BY 1),
              |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
              |  FROM documents)
              |SELECT tf.doc_id, tf.token, tf.tf, dfq.df, n.n_docs,
              |  (CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE))
              |    / CAST(dfq.df AS DOUBLE) AS relevance
              |FROM tf JOIN dfq USING (token) CROSS JOIN n""".stripMargin)),

    // Corpus vocabulary: top 100 tokens by frequency, (n desc, token)
    // deterministic ties. Plan: TakeOrderedAndProject over a map-side-
    // combined count — no global sort.
    "llm_vocab_topk" -> Q(
      (s, dir) => Curation.vocabTopK(Tables.documents(s, dir), "text", 100),
      Some(s"""SELECT token, CAST(count(*) AS BIGINT) AS n
              |FROM (SELECT unnest(${toksSql("text")}) AS token FROM documents)
              |WHERE token <> ''
              |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin)),

    // One BPE merge iteration: top-50 adjacent-token pair frequencies
    // with the merged form — the step between token counting and a real
    // tokenizer pipeline; the top row is the next merge rule. Map-side-
    // combined counts + TakeOrderedAndProject, no window; ties are total
    // on (n desc, pair), so the LIMIT boundary is engine-deterministic.
    "llm_bpe_pairs" -> Q(
      (s, dir) => Curation.bpePairCounts(Tables.documents(s, dir), "text", 50),
      Some(s"""SELECT pair, CAST(count(*) AS BIGINT) AS n,
              |replace(pair, ' ', '') AS merged
              |FROM (SELECT unnest(list_transform(range(1, len(ws)),
              |        i -> ws[i] || ' ' || ws[i+1])) AS pair
              |      FROM (SELECT ${toksSql("text")} AS ws FROM documents))
              |GROUP BY 1 ORDER BY n DESC, pair LIMIT 50""".stripMargin)),

    // BPE iteration 2: APPLY the top merge rule (greedy left-to-right,
    // the relational gap-and-islands selection — not a string replace,
    // which mis-merges self-overlapping rules) and recount pairs over
    // the re-merged streams. Both engines derive the rule themselves
    // from the deterministic (n desc, pair) top-1, so the 1-row
    // driver-side head() is fixture prep, not a data-path collect.
    "llm_bpe_merge2" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val rule = Curation.bpePairCounts(docs, "text", 1)
          .select(col("pair")).head().getString(0)
        val Array(pa, pb) = rule.split(" ", 2)
        Curation.bpePairCountsAfterMerge(docs, "doc_id", "text", pa, pb, 50)
      },
      Some(s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
              |p1 AS (SELECT pair FROM
              |  (SELECT unnest(list_transform(range(1, len(ws)),
              |      i -> ws[i] || ' ' || ws[i+1])) AS pair FROM norm)
              |  GROUP BY 1 ORDER BY count(*) DESC, pair LIMIT 1),
              |rule AS (SELECT string_split(pair, ' ')[1] AS pa,
              |  string_split(pair, ' ')[2] AS pb,
              |  replace(pair, ' ', '') AS m FROM p1),
              |e AS (SELECT doc_id, pos, t FROM
              |  (SELECT doc_id, CAST(unnest(range(0, len(ws))) AS INT) AS pos,
              |     unnest(ws) AS t FROM norm) WHERE t <> ''),
              |c AS (SELECT doc_id, pos, t,
              |  coalesce(t = pa AND lead(t) OVER
              |    (PARTITION BY doc_id ORDER BY pos) = pb, false) AS cand
              |  FROM e CROSS JOIN rule),
              |s AS (SELECT doc_id, pos, t, cand AND (pos -
              |    (coalesce(max(CASE WHEN NOT cand THEN pos END) OVER
              |      (PARTITION BY doc_id ORDER BY pos
              |       ROWS UNBOUNDED PRECEDING), -1) + 1)) % 2 = 0 AS sel
              |  FROM c),
              |k AS (SELECT doc_id, pos,
              |  CASE WHEN sel THEN (SELECT m FROM rule) ELSE t END AS token,
              |  coalesce(lag(sel) OVER
              |    (PARTITION BY doc_id ORDER BY pos), false) AS prev_sel
              |  FROM s),
              |p2 AS (SELECT token || ' ' || lead(token) OVER
              |    (PARTITION BY doc_id ORDER BY pos) AS pair
              |  FROM k WHERE NOT prev_sel)
              |SELECT pair, CAST(count(*) AS BIGINT) AS n,
              |  replace(pair, ' ', '') AS merged
              |FROM p2 WHERE pair IS NOT NULL
              |GROUP BY 1 ORDER BY n DESC, pair LIMIT 50""".stripMargin)),

    // Session assembly: gap-delimited sessions with payloads concatenated
    // chronologically — the conversation-assembly step for dialogue
    // training data. One window sort; per-session in-group assembly.
    "events_session_assembly" -> Q(
      (s, dir) => graft.ops.Windows.assembleSessions(
        Tables.events(s, dir), "user_id", "ts", "event_id", "event_type",
        gapMinutes = 30),
      Some("""WITH f AS (SELECT user_id, ts, event_id, event_type,
             |  CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
             |         (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |       OR epoch_us(CAST(ts AS TIMESTAMP))
             |          - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
             |            (PARTITION BY user_id ORDER BY ts, event_id)
             |          >= 1800000000
             |       THEN 1 ELSE 0 END AS flag FROM events),
             |g AS (SELECT user_id, ts, event_id, event_type,
             |  sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM f)
             |SELECT user_id, CAST(sid AS BIGINT) AS sid,
             |  min(CAST(ts AS TIMESTAMP)) AS session_start,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  coalesce(string_agg(event_type, ' -> ' ORDER BY ts, event_id),
             |    '') AS assembled
             |FROM g GROUP BY 1, 2""".stripMargin)),

    // C4-style line-level boilerplate removal. The synthetic corpus is
    // single-line, so the query builds the multi-line shape the operator
    // targets: a per-source header line (share 1.0 -> stripped), the
    // unique body (kept), and a promo line on every third doc (share
    // ~1/3 < 0.5 -> kept). The oracle replays the same frequency pass.
    "llm_strip_boilerplate" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("source"),
          concat(lit("header "), col("source"), lit("\n"), col("text"),
            when(col("doc_id") % 3 === 0, lit("\npromo line"))
              .otherwise(lit(""))).as("text"))
        TextAnalysis.stripBoilerplate(d, "doc_id", "text", "source",
          maxShare = 0.5)
      },
      Some(s"""WITH d AS (SELECT doc_id, source,
              |  'header ' || source || chr(10) || text ||
              |  CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'promo line'
              |       ELSE '' END AS t2 FROM documents),
              |lines AS (SELECT doc_id, source,
              |  CAST(unnest(range(0, len(ls))) AS INT) AS pos,
              |  unnest(ls) AS line
              |  FROM (SELECT doc_id, source, string_split(t2, chr(10)) AS ls
              |        FROM d)),
              |lh AS (SELECT doc_id, source, pos, line, ${h60("line")} AS h
              |  FROM lines),
              |nd AS (SELECT source, count(DISTINCT doc_id) AS n_docs
              |  FROM d GROUP BY 1),
              |ldf AS (SELECT source, h, count(*) AS df FROM
              |  (SELECT DISTINCT doc_id, source, h FROM lh) GROUP BY 1, 2),
              |boiler AS (SELECT source, h FROM ldf JOIN nd USING (source)
              |  WHERE CAST(df AS DOUBLE) / n_docs > 0.5),
              |kept AS (SELECT lh.* FROM lh ANTI JOIN boiler USING (source, h)),
              |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept_lines,
              |  string_agg(line, chr(10) ORDER BY pos) AS clean_text
              |  FROM kept GROUP BY 1)
              |SELECT d.doc_id, coalesce(a.n_kept_lines, 0) AS n_kept_lines,
              |  coalesce(a.clean_text, '') AS clean_text
              |FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin)),

    // Deterministic negative sampling (contrastive-training pairs):
    // bucket-hashed candidate selection with positive-pair exclusion and
    // an exact-int64 per-slot argmin — a pure function of (corpus, salt)
    // that any engine reproduces, unlike rand() samplers. Positives here
    // are the (id, id+1) adjacency, exercising the exclusion path.
    "llm_negative_sample" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"))
        Curation.negativeSample(
          emb, emb.filter(col("vec_id") < 10),
          emb.select(col("vec_id"), (col("vec_id") + 1).as("pos_id")),
          "vec_id", k = 4, nBuckets = 50, salt = 3)
      },
      Some {
        val b = (e: String) => s"${h60(e)} % 50"
        s"""WITH ids AS (SELECT vec_id FROM embeddings),
           |cb AS (SELECT vec_id AS cand_id,
           |  ${b("'3:' || CAST(vec_id AS VARCHAR)")} AS bucket FROM ids),
           |qs AS (SELECT vec_id AS query_id, CAST(slot AS INT) AS slot,
           |  ${b("'3:' || CAST(vec_id AS VARCHAR) || ':' || CAST(slot AS VARCHAR)")}
           |    AS bucket
           |  FROM ids CROSS JOIN (SELECT unnest(range(1, 5)) AS slot)
           |  WHERE vec_id < 10),
           |cand AS (SELECT query_id, slot, cand_id,
           |  ${h60("'3:' || CAST(query_id AS VARCHAR) || ':' || CAST(slot AS VARCHAR) || ':' || CAST(cand_id AS VARCHAR)")} AS h
           |  FROM cb JOIN qs USING (bucket)
           |  WHERE cand_id <> query_id
           |    AND cand_id <> query_id + 1)
           |SELECT query_id, slot, min_by(cand_id, h) AS neg_id
           |FROM cand GROUP BY 1, 2""".stripMargin
      }),

    // Sequence-length bucketing: exact quartile boundaries of the token
    // count, each doc assigned its length class (ties to the upper
    // bucket) — the padding-waste bound for fixed-size batch packing.
    "llm_length_buckets" -> Q(
      (s, dir) => Curation.lengthBuckets(
        Tables.documents(s, dir), "doc_id", "text", nBuckets = 4),
      Some(s"""WITH tc AS (SELECT doc_id,
              |  CAST(len(${toksSql("text")}) AS BIGINT) AS n_tokens
              |  FROM documents),
              |b AS (SELECT [quantile_cont(n_tokens, 0.25),
              |  quantile_cont(n_tokens, 0.5),
              |  quantile_cont(n_tokens, 0.75)] AS bs FROM tc)
              |SELECT doc_id, n_tokens,
              |  CAST(len(list_filter(bs, x -> CAST(n_tokens AS DOUBLE) >= x))
              |    AS INT) AS bucket
              |FROM tc CROSS JOIN b""".stripMargin)),

    // Deterministic uniform k-sample: smallest salted id-hash wins —
    // exact COUNT (vs the rate samplers), engine-reproducible, plans as
    // TakeOrderedAndProject (bounded per-partition heaps, no global
    // sort). The eval-set builder's sampler.
    "llm_uniform_sample" -> Q(
      (s, dir) => Curation.uniformSample(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("source")),
        "doc_id", k = 100, salt = 7),
      Some(s"""SELECT doc_id, lang, source FROM documents
              |ORDER BY ${h60("'7:' || CAST(doc_id AS VARCHAR)")}, doc_id
              |LIMIT 100""".stripMargin)),

    // Per-document n-gram novelty: the share of a doc's distinct
    // 3-shingles with corpus document-frequency 1 — boilerplate and
    // template text score low, genuinely new material high. Shingles
    // travel as 60-bit hashes; both shuffles key on the 8-byte hash.
    "llm_ngram_novelty" -> Q(
      (s, dir) => TextAnalysis.ngramNovelty(
        Tables.documents(s, dir), "doc_id", "text"),
      Some(s"""WITH sh AS (SELECT doc_id, ${h60("s")} AS h FROM
              |  (SELECT doc_id, unnest(${shinglesSql(toksSql("text"))}) AS s
              |   FROM documents)),
              |dfc AS (SELECT h, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1)
              |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
              |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
              |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
              |    AS novelty
              |FROM sh JOIN dfc USING (h) GROUP BY 1""".stripMargin)),

    // The full BPE TRAINING LOOP: 3 successive merge rules, each derived
    // from streams carrying every prior round's greedy merges (the
    // driver-loop-with-materialization pattern — one argmax rule row per
    // round crosses to the driver, as a tokenizer trainer requires). The
    // oracle replays all 3 rounds with the same relational greedy
    // selection, so rule CHAINING is what's hash-checked: a wrong round-1
    // application changes round-2's counts and goes red.
    "llm_bpe_train" -> Q(
      (s, dir) => Curation.bpeTrain(Tables.documents(s, dir), "doc_id", "text", 3),
      Some {
        val rounds = 3
        bpeCtes(rounds) + (1 to rounds).map(r =>
          s"SELECT CAST($r AS INT) AS round, pair, " +
            s"replace(pair, ' ', '') AS merged, n FROM p$r")
          .mkString("\n", "\nUNION ALL\n", "")
      }),

    // BPE ENCODE — the tokenizer APPLY step over the whole corpus: the
    // 3 trained merge rules applied greedily per document, every final
    // token emitted at its re-densified position. The oracle replays the
    // identical 3 training rounds AND the merged streams, so a selection
    // or application divergence anywhere in the chain shifts tokens and
    // goes red — this row hash-checks the actual model-input token
    // sequence, not just the rule table.
    "llm_bpe_encode" -> Q(
      (s, dir) => Curation.bpeEncode(Tables.documents(s, dir), "doc_id", "text", 3),
      Some {
        val rounds = 3
        bpeCtes(rounds) +
          s"""SELECT doc_id, CAST(row_number() OVER
             |  (PARTITION BY doc_id ORDER BY pos) - 1 AS INT) AS pos,
             |  t AS token
             |FROM e$rounds""".stripMargin
      }),

    // FROZEN-TOKENIZER encode: rules trained once on the full corpus
    // (the versioned artifact), applied to a DIFFERENT arriving set
    // with no retraining — the production split between tokenizer
    // training and the corpus-wide encode pass. The oracle replays
    // training on the corpus, then routes the SAME rule CTEs through
    // the shared application steps over the arriving stream: the rules
    // provably come from the corpus, not the encoded set.
    "llm_bpe_frozen_encode" -> Q(
      (s, dir) => {
        val fix = ensureBpeTokenizer(s, dir)
        val arriving = Tables.documents(s, dir)
          .filter(col("doc_id") % 10 === 7)
          .select((col("doc_id") + 7000000L).as("doc_id"), col("text"))
        Curation.bpeEncodeFrozen(s, fix, arriving, "doc_id", "text")
      },
      Some {
        val rounds = 3
        bpeCtes(rounds) +
          s""",anorm AS (SELECT doc_id + 7000000 AS doc_id, ws FROM norm
             |  WHERE doc_id % 10 = 7),
             |ae0 AS (SELECT doc_id, pos, t FROM
             |  (SELECT doc_id, CAST(unnest(range(0, len(ws))) AS INT) AS pos,
             |     unnest(ws) AS t FROM anorm) WHERE t <> '')""".stripMargin +
          (1 to rounds).map(bpeStepSql(_, "a")).mkString +
          s"""
             |SELECT doc_id, CAST(row_number() OVER
             |  (PARTITION BY doc_id ORDER BY pos) - 1 AS INT) AS pos,
             |  t AS token
             |FROM ae$rounds""".stripMargin
      }))

  /** The BPE training-loop CTE chain (DuckDB twin of
    * [[Curation.bpeTrain]]'s loop): `e0` is the tokenized corpus, round r
    * derives its greedy rule in `p_r`/`rule_r` and the r-times-merged
    * streams in `e_r`. Shared by the train row (which reads the `p_r`
    * rule rows) and the encode row (which reads the final `e_rounds`
    * stream), so both replay the SAME chain — ends open, caller appends
    * its SELECT.
    */
  private def bpeCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH norm AS (SELECT doc_id, ${toksSql("text")} AS ws FROM documents),
              |e0 AS (SELECT doc_id, pos, t FROM
              |  (SELECT doc_id, CAST(unnest(range(0, len(ws))) AS INT) AS pos,
              |     unnest(ws) AS t FROM norm) WHERE t <> '')""".stripMargin
    for (r <- 1 to rounds) {
      val prev = s"e${r - 1}"
      sb ++= s""",
                |p$r AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM
                |  (SELECT t || ' ' || lead(t) OVER
                |     (PARTITION BY doc_id ORDER BY pos) AS pair FROM $prev)
                |  WHERE pair IS NOT NULL
                |  GROUP BY 1 ORDER BY n DESC, pair LIMIT 1),
                |rule$r AS (SELECT string_split(pair, ' ')[1] AS pa,
                |  string_split(pair, ' ')[2] AS pb,
                |  replace(pair, ' ', '') AS m FROM p$r)""".stripMargin
      sb ++= bpeStepSql(r, "")
    }
    sb ++= "\n"
    sb.toString
  }

  /** One greedy-merge APPLICATION round in SQL: candidate flags, the
    * leftmost-non-overlapping parity selection, merge + swallow of the
    * second element. Shared by the training chain ([[bpeCtes]], which
    * also derives `rule_r` from its own stream) and the frozen-apply
    * chain (which reuses the training chain's rules over a DIFFERENT,
    * `prefix`-named stream) — one copy, so train-time and apply-time
    * merge semantics cannot drift.
    */
  private def bpeStepSql(r: Int, prefix: String): String = {
    val prev = s"${prefix}e${r - 1}"
    val (c, s2, k, e) =
      (s"${prefix}c$r", s"${prefix}s$r", s"${prefix}k$r", s"${prefix}e$r")
    s""",
       |$c AS (SELECT doc_id, pos, t,
       |  row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn,
       |  coalesce(t = pa AND lead(t) OVER
       |    (PARTITION BY doc_id ORDER BY pos) = pb, false) AS cand
       |  FROM $prev CROSS JOIN rule$r),
       |$s2 AS (SELECT doc_id, pos, t, cand AND (rn -
       |    (coalesce(max(CASE WHEN NOT cand THEN rn END) OVER
       |      (PARTITION BY doc_id ORDER BY pos
       |       ROWS UNBOUNDED PRECEDING), 0) + 1)) % 2 = 0 AS sel
       |  FROM $c),
       |$k AS (SELECT doc_id, pos,
       |  CASE WHEN sel THEN (SELECT m FROM rule$r) ELSE t END AS t,
       |  coalesce(lag(sel) OVER
       |    (PARTITION BY doc_id ORDER BY pos), false) AS prev_sel
       |  FROM $s2),
       |$e AS (SELECT doc_id, pos, t FROM $k WHERE NOT prev_sel)""".stripMargin
  }
}
