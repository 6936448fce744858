package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the assertion layer a pipeline runs
  * after [[Aggs.profileColumns]] before promoting a new drop of data.
  * The reference trusts its sources blindly (BigQuery load errors are the
  * only validation, `transform_open_close_data.py:34` retries aside);
  * production pipelines gate on explicit rules instead.
  */
object Checks {

  /** Count violations of scalar row rules in ONE scan: each rule is a
    * boolean predicate over a single row ("violation when true"), counted
    * with a conditional sum — all longs, so the pass is one
    * map-side-combined HashAggregate over one pruned scan regardless of
    * how many rules ride it. The final unpivot explodes a one-row frame.
    *
    * Uniqueness/referential rules need grouping or joins and live in
    * [[duplicateKeys]] / [[orphanKeys]] — mixing them in here would drag
    * a shuffle into what is otherwise a pure scan.
    */
  def ruleViolations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = rules.map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(s"v_$name")
    } :+ count(lit(1)).as("n_rows")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col("n_rows"),
          // backticks: a rule name containing '.' must resolve as one
          // column name, not a struct-field path
          col(s"`v_$name`").as("n_violations"))
      }: _*)).as("p"))
      .select(col("p.*"))
  }

  /** Duplicate-key audit: how many key groups occur more than once, and
    * how many surplus rows a dedup would drop. Map-side-combined count by
    * key (shuffle = distinct-key cardinality), then a second tiny
    * aggregate over the group counts — never a self-join.
    */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
        sum(when(col("n") > 1, col("n") - 1).otherwise(0L)).as("n_surplus_rows"))

  /** Referential-integrity audit: rows of `child` whose `childKey` has no
    * match in `parent.parentKey`. ONE scan of the (large) child side: a
    * left join against the distinct'd parent keys computes total rows and
    * orphan rows in the same pass — a separate count + anti-join would
    * read the fact table twice. At scale the parent side is distinct'd
    * first so the join shuffles key-cardinality rows, and a
    * dimension-sized parent broadcasts.
    */
  def orphanKeys(child: DataFrame, childKey: String,
                 parent: DataFrame, parentKey: String,
                 relation: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct()
        .withColumn("__hit", lit(1)), Seq(childKey), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
      .select(lit(relation).as("relation"), col("n_rows"), col("n_orphans"))

  /** k-anonymity audit over quasi-identifier columns: group sizes plus
    * the re-identification risk flag (a group smaller than `k` makes its
    * members linkable). The privacy gate a training-data pipeline runs
    * before releasing records that carry quasi-identifiers. One
    * map-side-combined aggregate — shuffle rows = group cardinality,
    * never data size.
    *
    * @return one row per quasi-identifier group:
    *         (quasiCols..., n, at_risk) with at_risk in {0, 1}
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityAudit: no quasi columns")
    require(k > 0, s"k must be positive, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", (col("n") < k).cast("int"))
  }

  /** Enforce k-anonymity by SUPPRESSION: rows whose quasi-identifier
    * group is smaller than `k` get those columns nulled (the standard
    * suppression step; generalization hierarchies are domain-specific
    * and compose upstream by rewriting the columns first). Non-quasi
    * columns always pass through untouched, so utility loss is confined
    * to the linkable fields of the linkable rows.
    *
    * Scale shape: the risky-group frame is group-cardinality-sized and
    * joins back on the quasi key (AQE broadcasts it when small — the
    * common case, since risky groups are by definition the rare ones);
    * the data is scanned twice (count pass + rewrite pass), the
    * unavoidable minimum for a group-conditional rewrite.
    *
    * Rows with a NULL quasi-identifier value pass through unchanged:
    * SQL join semantics never match them against the risky frame, which
    * is the right outcome — a null identifier is already non-linkable,
    * so there is nothing left to suppress.
    */
  def suppressBelowK(df: DataFrame, quasiCols: Seq[String],
                     k: Long): DataFrame = {
    // Fresh marker name: a hard-coded "__risk" would be ambiguous (and
    // silently corrupt the suppression predicate) on an input that
    // already carries that column — the uniformSample temp-column class.
    val riskCol = Iterator.from(0).map(i => s"__risk$i")
      .find(n => !df.columns.contains(n)).get
    val risky = kAnonymityAudit(df, quasiCols, k)
      .filter(col("at_risk") === 1)
      .select(quasiCols.map(col): _*)
      .withColumn(riskCol, lit(1))
    val out = df.columns.map { c =>
      if (quasiCols.contains(c))
        when(col(riskCol).isNotNull, lit(null)).otherwise(col(c)).as(c)
      else col(c)
    }
    df.join(risky, quasiCols, "left").select(out.toIndexedSeq: _*)
  }

  /** Benford's-law expected first-digit shares in ppm, digit -> share.
    * Computed once here and inlined as plan literals — the oracle embeds
    * the SAME Scala-computed constants, so no cross-engine log10 call
    * exists anywhere.
    */
  val BenfordPpm: Map[Int, Long] =
    (1 to 9).map(d => d -> math.round(math.log10(1 + 1.0 / d) * 1e6)).toMap

  /** Benford's-law first-digit audit — the classic anomaly screen for
    * invented numeric data (amounts, totals, counts spanning orders of
    * magnitude). Values pin to integer cents FIRST (a double's string
    * form is engine-specific; a long's is not), the leading significant
    * digit is the first character of the long's decimal form (the x100
    * shift never changes it), and the observed share is exact integer
    * ppm. One map-side-combined aggregate; everything after it runs on
    * the 9-row digit frame.
    *
    * Domain edges, both fail-safe: a positive value that pins to 0
    * cents (below ~0.005) has no leading digit at this resolution and
    * is FILTERED (digit 0 with a NULL expected_ppm would otherwise
    * leak out), and a value past the exactly-castable cents range
    * (>= 9.0e16) raises instead of silently wrapping the long cast.
    *
    * @return one row per observed leading digit:
    *         (digit, n, expected_ppm, observed_ppm)
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol)
    val guarded = when(v >= lit(9.0e16),
        raise_error(concat(lit(s"benfordAudit: $valueCol value "),
          v.cast("string"),
          lit(" overflows the long cents pin (>= 9.0e16)"))))
      .otherwise(floor(v * lit(100.0) + lit(0.5)))
    val counts = df.filter(v > 0)
      .select(guarded.cast("long").as("cents"))
      .filter(col("cents") >= 1L)
      .select(substring(col("cents").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val sorted = BenfordPpm.toSeq.sortBy(_._1)
    val expected = sorted.tail.foldLeft(
      when(col("digit") === sorted.head._1, lit(sorted.head._2))) {
      case (acc, (d, p)) => acc.when(col("digit") === d, lit(p))
    }
    // The total's window runs over the 9-row digit frame, not the data.
    counts
      .withColumn("expected_ppm", expected)
      .withColumn("observed_ppm",
        expr("(n * 1000000) div sum(n) over " +
          "(partition by 1 rows between unbounded preceding " +
          "and unbounded following)"))
      .select(col("digit"), col("n"), col("expected_ppm"),
        col("observed_ppm").cast("long").as("observed_ppm"))
  }

  /** Laplace-noised group counts — the differential-privacy release
    * mechanism (sensitivity-1 count query, scale b = 1/ε) with the
    * noise drawn by INVERSE CDF from a hash-seeded uniform: u derives
    * from the group key + `salt`, so the release is a pure function of
    * (data, salt) and replays identically anywhere — the posture used
    * to TEST a DP pipeline end-to-end. A production release draws fresh
    * randomness per query instead (re-releasing under new salts leaks);
    * the mechanism's shape — u -> -sign(v)·b·ln(1-2|v|), v = u-1/2 —
    * is exactly the one a secure-sampler deployment runs.
    *
    * Noise pins to integer micro-units (the library float convention),
    * and u is the half-open lattice `(k + 0.5)/1e6`, which never hits
    * 1/2 exactly and keeps `1-2|v| >= 1e-6`, so the noise magnitude is
    * bounded by ~13.8·b — no infinities at the lattice edge. One
    * map-side-combined aggregate; the noise is a per-group projection.
    *
    * @return (groupCols..., n, noisy_units): the exact count and the
    *         noised count in micro-units (`n·1e6 + noise_units`)
    */
  def dpNoisyCounts(df: DataFrame, groupCols: Seq[String],
                    epsilon: Double, salt: String): DataFrame = {
    require(groupCols.nonEmpty, "dpNoisyCounts: no group columns")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val key = concat_ws("|", groupCols.map(c => col(c).cast("string")): _*)
    val u = (pmod(graft.llm.TextOps.hash60(
        concat(lit(s"dp:$salt:"), key)), lit(1000000L)).cast("double") +
      lit(0.5)) / lit(1000000.0)
    val v = u - lit(0.5)
    val noiseUnits = floor(
      -(lit(1.0) / lit(epsilon) * signum(v)) *
        log(lit(1.0) - lit(2.0) * abs(v)) * lit(1e6) + lit(0.5))
      .cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("noisy_units",
        col("n") * lit(1000000L) + noiseUnits)
  }

  /** Population-stability-index drift audit between two cohorts (the
    * standard "did this feature's distribution move" screen a pipeline
    * runs between a reference snapshot and the current drop): bin the
    * value into `nBins` equal-width bins over the GLOBAL min/max (the
    * [[Aggs.histogram]] recipe — identical double bin edges in any
    * engine), count per (bin, cohort), and emit each bin's PSI
    * contribution in integer micro-units (Σ over bins ≥ 0.25 is the
    * conventional "major shift" alarm). Shares are Laplace-smoothed —
    * (c+1)/(n+nBins) — so empty bins contribute finitely instead of
    * ±∞; empty bins are kept via the static bin-range join, so the
    * output is always exactly `nBins` rows.
    *
    * Scale shape: one min/max pass + one map-side-combined (bin, cohort)
    * count; everything after runs on the nBins-row frame (the window
    * totals included). Float discipline: counts are exact longs, the
    * shares and ln are doubles derived from exact integers with ONE
    * parenthesization the oracle mirrors verbatim, and each bin's
    * contribution pins to micro-units BEFORE any cross-bin sum.
    *
    * @param isA cohort predicate over the input row (true = cohort A,
    *            the reference side); evaluated before binning.
    * @return one row per bin: (bin, n_a, n_b, psi_micro)
    */
  /** The ONE equal-width binning expression every histogram-drift
    * consumer shares ([[psiDrift]], [[writeDriftReference]],
    * [[psiAgainstReference]], and their oracles replicate it verbatim):
    * values outside [lo, hi] clamp into the edge bins — exactly what a
    * frozen-reference monitor needs for out-of-range arrivals.
    */
  private def binExpr(v: Column, lo: Column, hi: Column,
                      nBins: Int): Column =
    when(hi > lo,
      least(greatest(floor((v - lo) / ((hi - lo) / lit(nBins.toDouble))),
        lit(0.0)), lit((nBins - 1).toDouble)).cast("int"))
      .otherwise(lit(0))

  def psiDrift(df: DataFrame, valueCol: String, isA: Column,
               nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val spark = df.sparkSession
    val base = df.select(col(valueCol).as("__v"), isA.as("__a"))
      .filter(col("__v").isNotNull)
    val bounds = base.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val binned = base.crossJoin(broadcast(bounds))
      .select(
        binExpr(col("__v"), col("__lo"), col("__hi"), nBins).as("bin"),
        col("__a"))
      .groupBy(col("bin"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
           sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"))
    val full = spark.range(nBins).select(col("id").cast("int").as("bin"))
      .join(binned, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    // Totals ride a window over the nBins-row frame, not the data.
    val tw = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val pa = (col("n_a") + lit(1L)).cast("double") /
      (sum(col("n_a")).over(tw) + lit(nBins.toLong)).cast("double")
    val pb = (col("n_b") + lit(1L)).cast("double") /
      (sum(col("n_b")).over(tw) + lit(nBins.toLong)).cast("double")
    full.select(col("bin"), col("n_a"), col("n_b"),
      floor((pa - pb) * log(pa / pb) * lit(1e6) + lit(0.5))
        .cast("long").as("psi_micro"))
  }

  /** Freeze the drift-monitor REFERENCE artifact: the value column's
    * equal-width histogram (bin edges from the reference's own min/max,
    * per-bin counts, empty bins kept) written as a tiny versioned
    * parquet — the distribution a streaming monitor compares every
    * arriving batch against. Freezing matters: recomputing edges per
    * batch would let drift move the yardstick it is measured by (the
    * same posture as the frozen KN-LM / classifier gate artifacts).
    *
    * Artifact schema, one row per bin: (bin, n_ref, lo, hi) with the
    * global edges repeated per row so a consumer needs no second read.
    */
  def writeDriftReference(df: DataFrame, valueCol: String, nBins: Int,
                          path: String): Unit = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val spark = df.sparkSession
    val base = df.select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val bounds = base.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val counts = base.crossJoin(broadcast(bounds))
      .select(binExpr(col("__v"), col("__lo"), col("__hi"), nBins).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_ref"))
    // An empty / all-NULL reference aggregates NULL bounds; writing
    // that artifact would make every later psiAgainstReference die with
    // an opaque NPE at getDouble — fail loud at WRITE time instead (the
    // in-plan raise_error idiom: zero extra jobs, the guard rides the
    // same scan).
    spark.range(nBins).select(col("id").cast("int").as("bin"))
      .join(counts, Seq("bin"), "left")
      .crossJoin(broadcast(bounds.select(
        col("__lo").as("lo"), col("__hi").as("hi"))))
      .select(col("bin"), coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        when(col("lo").isNull, raise_error(lit(
          "writeDriftReference: reference frame has no non-null values " +
            "for the drift column - refusing to freeze an unusable " +
            "artifact"))).otherwise(col("lo")).as("lo"),
        col("hi"))
      .write.mode("overwrite").parquet(path)
  }

  /** PSI of `arriving` against a FROZEN [[writeDriftReference]]
    * artifact — the per-batch body of the streaming drift monitor.
    * Arrivals bin with the artifact's edges (out-of-range values clamp
    * into the edge bins), shares are Laplace-smoothed exactly as in
    * [[psiDrift]], and each bin's contribution pins to micro-units.
    * The artifact is nBins rows, so reading it per batch costs nothing;
    * the arriving side is one map-side-combined bin count.
    *
    * @return one row per bin: (bin, n_ref, n_new, psi_micro)
    */
  def psiAgainstReference(spark: org.apache.spark.sql.SparkSession,
                          refPath: String, arriving: DataFrame,
                          valueCol: String): DataFrame = {
    val ref = spark.read.parquet(refPath)
    // Bounded driver read: the artifact is nBins rows by construction.
    val head = ref.agg(max(col("bin")).cast("int").as("mb"),
      max(col("lo")).as("lo"), max(col("hi")).as("hi")).head()
    // Artifacts written before the writeDriftReference empty-frame
    // guard may carry NULL edges; a typed error beats the NPE that
    // head.getDouble would otherwise throw mid-batch.
    if (head.isNullAt(0) || head.isNullAt(1) || head.isNullAt(2))
      throw new IllegalArgumentException(
        s"psiAgainstReference: drift artifact at $refPath has NULL " +
          "bin/lo/hi (written from an empty or all-NULL reference) - " +
          "re-freeze it from a frame with non-null values")
    val (nBins, lo, hi) = (head.getInt(0) + 1, head.getDouble(1),
      head.getDouble(2))
    val newCounts = arriving
      .select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .select(binExpr(col("__v"), lit(lo), lit(hi), nBins).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_new"))
    val full = ref.select(col("bin"), col("n_ref"))
      .join(newCounts, Seq("bin"), "left")
      .select(col("bin"), col("n_ref"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val tw = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val pr = (col("n_ref") + lit(1L)).cast("double") /
      (sum(col("n_ref")).over(tw) + lit(nBins.toLong)).cast("double")
    val pn = (col("n_new") + lit(1L)).cast("double") /
      (sum(col("n_new")).over(tw) + lit(nBins.toLong)).cast("double")
    full.select(col("bin"), col("n_ref"), col("n_new"),
      floor((pn - pr) * log(pn / pr) * lit(1e6) + lit(0.5))
        .cast("long").as("psi_micro"))
  }

  /** Chi-squared homogeneity statistic between two cohorts over a
    * CATEGORICAL column — the drift screen for discrete features
    * ([[psiDrift]]/[[ksDrift]] cover numeric ones). Per category, the
    * observed (cohort A, cohort B) cell counts are tested against the
    * homogeneity expectation e = rowTotal·cohortTotal/grandTotal; the
    * output carries each category's contribution (both cells) pinned to
    * integer micro-units BEFORE any cross-category sum, so Σ is exact
    * and comparable to the χ² critical value at (categories−1) d.o.f.
    *
    * One map-side-combined category count; totals ride a window over
    * the category-cardinality frame. Doubles appear only in the final
    * per-category projection, mirrored verbatim by the oracle. An empty
    * cohort makes every expectation 0 and the statistic undefined —
    * NULL via nullif, not a division error.
    *
    * @return one row per category: (catCol, n_a, n_b, chi2_micro)
    */
  def chi2Drift(df: DataFrame, catCol: String, isA: Column): DataFrame = {
    val counts = df.select(col(catCol).as(catCol), isA.as("__a"))
      .filter(col(catCol).isNotNull)
      .groupBy(col(catCol))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
           sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"))
    val tw = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val ta = sum(col("n_a")).over(tw)
    val tb = sum(col("n_b")).over(tw)
    val rowT = (col("n_a") + col("n_b")).cast("double")
    val tot = (ta + tb).cast("double")
    val ea = nullif(rowT * ta.cast("double") / tot, lit(0.0))
    val eb = nullif(rowT * tb.cast("double") / tot, lit(0.0))
    val oa = col("n_a").cast("double")
    val ob = col("n_b").cast("double")
    counts.select(col(catCol), col("n_a"), col("n_b"),
      floor(((oa - ea) * (oa - ea) / ea + (ob - eb) * (ob - eb) / eb)
        * lit(1e6) + lit(0.5)).cast("long").as("chi2_micro"))
  }

  /** Kolmogorov–Smirnov drift statistic between two cohorts: the max
    * over all values of |F_a(v) − F_b(v)|, reported in exact ppm — the
    * distribution-free companion to [[psiDrift]] (no binning choice, so
    * it catches shifts PSI's fixed bins smear). All arithmetic is
    * integer-exact: cumulative counts come from one distinct-value
    * pre-aggregate fed through the two-phase [[Windows.prefixSums]]
    * (never a global single-partition window), the per-value statistic
    * is the cross-multiplied |cum_a·n_b − cum_b·n_a| (longs), and only
    * the final one-row scaling divides — as DECIMAL, since max_diff·1e6
    * overflows a long past ~9e12 rows per cohort.
    *
    * Scale shape: map-side-combined distinct-value aggregate (shuffle =
    * value cardinality), range-partitioned prefix sums on that frame,
    * one max. Cohort sizes above 3e9 rows would overflow the long
    * cross-multiply and raise instead of wrapping.
    *
    * @return one row: (n_a, n_b, ks_ppm); ks_ppm is NULL when either
    *         cohort is empty (the statistic is undefined, not 0).
    */
  def ksDrift(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val counts = df.select(col(valueCol).as("v"), isA.as("__a"))
      .filter(col("v").isNotNull)
      .groupBy(col("v"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("ca"),
           sum(when(!col("__a"), 1L).otherwise(0L)).as("cb"))
    val cum = Windows.prefixSums(counts, Materialize.Local,
      Seq(col("v")), Seq("ca", "cb"))
    // One tiny totals row broadcast onto the distinct-value frame; the
    // overflow guard rides the broadcast side so it costs nothing per row.
    val totals = counts.agg(
        sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
      .select(
        when(col("n_a") > lit(3000000000L) || col("n_b") > lit(3000000000L),
          raise_error(lit("ksDrift: cohort above 3e9 rows would overflow " +
            "the long cross-multiply")))
          .otherwise(col("n_a")).as("n_a"),
        col("n_b"))
    cum.crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"),
        abs(col("cum_ca") * col("n_b") - col("cum_cb") * col("n_a"))
          .as("diff"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("diff")).as("max_diff"))
      .select(col("n_a"), col("n_b"),
        expr("CAST((CAST(max_diff AS DECIMAL(38,0)) * 1000000) div " +
          "nullif(CAST(n_a AS DECIMAL(38,0)) * n_b, 0) AS BIGINT)")
          .as("ks_ppm"))
  }
}
