package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops._

/** The named, oracle-checked query set (driver contract; SURVEY.md §5.1).
  *
  * Every entry exercises one operator family from SURVEY.md §2 against the
  * driver test tables (TESTDATA.md), with equivalent ANSI SQL for the DuckDB
  * oracle where SQL-expressible. Naming/typing rules that keep the
  * hash-compare honest:
  *
  *  - every computed column is aliased identically in Spark and SQL;
  *  - aggregate types are pinned (`year` -> INT, `count` -> BIGINT) because
  *    DuckDB widens where Spark does not;
  *  - float-summing is confined to integer-valued doubles (`l_quantity`) or
  *    decimals - summation order differs between engines, so free-form
  *    double sums would differ in the last ulp;
  *  - orderings are total (unique tiebreak column) wherever order matters.
  */
final case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object Queries {

  /** Relational / parity query surface (SURVEY §2.2-§2.7). */
  val relational: Map[String, Q] = Map(

    // J3 + A1 - the flagship: star join over the full schema, broadcast
    // dims, yearly rollup. BigQuery-side surface per `code/sql/DDLs` keys.
    "j3_star_join" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"),
            year(col("o_orderdate")).as("order_year"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n_items"),
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"))
      },
      Some("""SELECT r_name, n_name, CAST(year(o_orderdate) AS INT) AS order_year,
             |sum(l_quantity) AS sum_qty, CAST(count(*) AS BIGINT) AS n_items,
             |min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1, 2, 3""".stripMargin)),

    // A1 - yearly rollup per key (the open_close yearly summary analog).
    "a1_yearly_rollup" -> Q(
      (s, dir) => Aggs.yearlyRollup(
        Tables.lineitem(s, dir), "l_returnflag", "l_shipdate", Seq(
          sum(col("l_quantity")).as("sum_qty"),
          avg(col("l_quantity")).as("avg_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("n"))).withColumnRenamed("l_returnflag", "flag"),
      Some("""SELECT l_returnflag AS flag, CAST(year(l_shipdate) AS INT) AS year,
             |sum(l_quantity) AS sum_qty, avg(l_quantity) AS avg_qty,
             |min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
             |CAST(count(*) AS BIGINT) AS n
             |FROM lineitem GROUP BY 1, 2""".stripMargin)),

    // P1 + F1 - null-rejecting date parse (raw_to_landing_sparkjob.py:35-37):
    // corrupt every 7th date string, parse, reject.
    "p1_invalid_date_filter" -> Q(
      (s, dir) => {
        val withJunk = Tables.orders(s, dir).withColumn("Date",
          when(col("o_orderkey") % 7 === 0, lit("not-a-date"))
            .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")))
        Clean.parseDateStrict(withJunk, "Date").select(col("o_orderkey"), col("Date"))
      },
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS Date
             |FROM orders WHERE o_orderkey % 7 <> 0""".stripMargin)),

    // P2 + P3 + P4 + F2 + F6 - comparison filter, column drop,
    // select-with-alias/cast projection.
    "p2_p4_filter_project" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .drop("l_tax", "l_discount")
        .filter(col("l_quantity") > 25)
        .select(
          col("l_orderkey").as("order_id"),
          col("l_linenumber").as("line_no"),
          col("l_quantity").cast("int").as("qty_int"),
          col("l_extendedprice").as("price"),
          col("l_returnflag").as("flag")),
      Some("""SELECT l_orderkey AS order_id, l_linenumber AS line_no,
             |CAST(l_quantity AS INT) AS qty_int, l_extendedprice AS price,
             |l_returnflag AS flag FROM lineitem WHERE l_quantity > 25""".stripMargin)),

    // P5 + P6 + F4 + F5 + F7 - literal tag, derived year, upper/lower.
    "p5_p6_lit_derived" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .withColumn("Source", lit("Kaggle"))
        .withColumn("year", year(col("o_orderdate")))
        .select(
          col("o_orderkey"), col("Source"), col("year"),
          upper(col("o_orderpriority")).as("prio_u"),
          lower(col("o_orderstatus")).as("status_l")),
      Some("""SELECT o_orderkey, 'Kaggle' AS Source,
             |CAST(year(o_orderdate) AS INT) AS year,
             |upper(o_orderpriority) AS prio_u, lower(o_orderstatus) AS status_l
             |FROM orders""".stripMargin)),

    // P7 - metric-allowlist isin filter
    // (transform_job_tabular_entitities.py:19).
    "p7_allowlist_isin" -> Q(
      (s, dir) => Clean.allowlistFilter(
          Tables.part(s, dir), "p_type", Seq("ECONOMY", "SMALL"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n")),
      Some("""SELECT p_brand, CAST(count(*) AS BIGINT) AS n FROM part
             |WHERE p_type IN ('ECONOMY', 'SMALL') GROUP BY 1""".stripMargin)),

    // P8 - column rename (transform_job_tabular_entitities.py:16-17).
    "p8_rename" -> Q(
      (s, dir) => Tables.customer(s, dir)
        .withColumnRenamed("c_name", "customer_name")
        .withColumnRenamed("c_acctbal", "balance")
        .select("c_custkey", "customer_name", "balance"),
      Some("""SELECT c_custkey, c_name AS customer_name, c_acctbal AS balance
             |FROM customer""".stripMargin)),

    // J2 - allowlist left-semi join (broadcast build side).
    "j2_semi_join" -> Q(
      (s, dir) => {
        val keys = Tables.part(s, dir).filter(col("p_size") > 40)
          .select(col("p_partkey").as("l_partkey"))
        Joins.semiFilter(Tables.lineitem(s, dir), keys, Seq("l_partkey"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      },
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             |sum(l_quantity) AS sum_qty FROM lineitem
             |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
             |GROUP BY 1""".stripMargin)),

    // O1 - 2-way unionByName with reordered columns
    // (raw_to_landing_sparkjob.py:134).
    "o1_union_by_name" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val low = o.filter(col("o_totalprice") < 1000)
          .select(col("o_orderkey"), col("o_orderstatus"), lit("low").as("bucket"))
        val high = o.filter(col("o_totalprice") >= 1000)
          .select(lit("high").as("bucket"), col("o_orderstatus"), col("o_orderkey"))
        low.unionByName(high)
      },
      Some("""SELECT o_orderkey, o_orderstatus, 'low' AS bucket FROM orders
             |WHERE o_totalprice < 1000
             |UNION ALL
             |SELECT o_orderkey, o_orderstatus, 'high' AS bucket FROM orders
             |WHERE o_totalprice >= 1000""".stripMargin)),

    // O2/O3 - N-way union fold (raw_to_landing_sparkjob.py:181-184).
    "o2_nway_union" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val branches = Seq("A", "N", "R").map { f =>
          li.filter(col("l_returnflag") === f)
            .select(col("l_orderkey"), col("l_quantity"), lit(s"branch_$f").as("branch"))
        }
        SetOps.unionAll(branches)
          .groupBy(col("branch"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      },
      Some("""SELECT 'branch_' || l_returnflag AS branch,
             |CAST(count(*) AS BIGINT) AS n, sum(l_quantity) AS sum_qty
             |FROM lineitem WHERE l_returnflag IN ('A', 'N', 'R')
             |GROUP BY 1""".stripMargin)),

    // O5 - top-k via orderBy.limit (plans as TakeOrderedAndProject, no
    // global sort); total ordering via the unique key.
    "o5_topk" -> Q(
      (s, dir) => SetOps.topK(Tables.orders(s, dir), 100,
          col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // O5 - INTERSECT / EXCEPT exposure.
    "o5_intersect_except" -> Q(
      (s, dir) => {
        val custNations = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
        val suppNations = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
        val allNations = Tables.nation(s, dir).select(col("n_nationkey").as("nationkey"))
        SetOps.intersection(custNations, suppNations).withColumn("tag", lit("both"))
          .unionByName(
            SetOps.difference(allNations, suppNations).withColumn("tag", lit("nosupp")))
      },
      Some("""SELECT nationkey, 'both' AS tag FROM
             |(SELECT c_nationkey AS nationkey FROM customer
             | INTERSECT SELECT s_nationkey FROM supplier)
             |UNION ALL
             |SELECT nationkey, 'nosupp' AS tag FROM
             |(SELECT n_nationkey AS nationkey FROM nation
             | EXCEPT SELECT s_nationkey FROM supplier)""".stripMargin)),

    // O5/A2 - grouped top-k via the custom bounded-heap aggregate
    // (graft.functions.TopKByScore): map-side-combined, O(k) state per
    // group, no per-partition sort - vs the window row_number approach.
    "o5_grouped_topk" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(graft.functions.AggFunctions.topK(
          col("o_totalprice"), col("o_orderkey").cast("string"), 3).as("top"))
        .select(col("o_orderpriority"),
          posexplode(col("top")).as(Seq("i", "entry")))
        .select(col("o_orderpriority"), (col("i") + 1).cast("int").as("rank"),
          col("entry.score").as("o_totalprice"),
          col("entry.value").cast("long").as("o_orderkey")),
      Some("""SELECT o_orderpriority, CAST(rn AS INT) AS rank,
             |o_totalprice, o_orderkey FROM (
             |  SELECT o_orderpriority, o_totalprice, o_orderkey,
             |    row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice DESC, CAST(o_orderkey AS VARCHAR)) AS rn
             |  FROM orders) t WHERE rn <= 3""".stripMargin)),

    // A2 - exact distinct counts per group.
    "a2_distinct_exact" -> Q(
      (s, dir) => Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
        .agg(count_distinct(col("l_suppkey")).as("n_supp"),
             count_distinct(col("l_partkey")).as("n_part")),
      Some("""SELECT l_returnflag, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
             |CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // A2 - approx_count_distinct: the HLL++ ESTIMATE has no DuckDB
    // equivalent, but its accuracy CONTRACT does — the row carries the
    // exact count plus a flag that the estimate landed within 3x the
    // requested rsd (0.05 -> bound 0.15; measured max relative error at
    // sf0.001/0.01/0.1 is 3%), making the estimate's guarantee
    // hash-checkable while the engine-specific value stays internal.
    "a2_approx_distinct" -> Q(
      (s, dir) => Aggs.distinctCounts(Tables.lineitem(s, dir), "l_returnflag", "l_suppkey")
        .select(col("l_returnflag"),
          col("exact_distinct").as("n_exact"),
          (abs(col("approx_distinct") - col("exact_distinct")) <=
            lit(0.15) * col("exact_distinct")).cast("int").as("within_rsd_bound")),
      Some("""SELECT l_returnflag, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_exact,
             |CAST(1 AS INT) AS within_rsd_bound FROM lineitem GROUP BY 1""".stripMargin)),

    // A2 - approx_percentile accuracy contract, same oracle shape as
    // a2_approx_distinct: the sketch value is engine-specific but its
    // rank-error guarantee (≤ n/accuracy, tie-safe interval form) is
    // checkable anywhere.
    "a2_approx_percentile" -> Q(
      (s, dir) => Aggs.approxPercentileContract(
        Tables.lineitem(s, dir), "l_extendedprice",
        Seq(0.25, 0.5, 0.75), accuracy = 1000),
      Some("""SELECT p, (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows,
             |CAST(1 AS INT) AS rank_err_ok
             |FROM (SELECT unnest([0.25, 0.5, 0.75]) AS p)""".stripMargin)),

    // Fixed-width histogram: 20 equal bins over the exact price range,
    // empty bins kept; both engines compute identical double bin edges.
    "histogram_prices" -> Q(
      (s, dir) => Aggs.histogram(Tables.orders(s, dir), "o_totalprice", 20),
      Some("""WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
             |  FROM orders WHERE o_totalprice IS NOT NULL),
             |binned AS (SELECT CASE WHEN hi > lo THEN
             |    CAST(least(greatest(floor((o_totalprice - lo)
             |      / ((hi - lo) / 20)), 0), 19) AS INT)
             |  ELSE 0 END AS bin FROM orders CROSS JOIN b
             |  WHERE o_totalprice IS NOT NULL),
             |counts AS (SELECT bin, CAST(count(*) AS BIGINT) AS n
             |  FROM binned GROUP BY 1)
             |SELECT CAST(r.range AS INT) AS bin, coalesce(c.n, 0) AS n
             |FROM range(20) r LEFT JOIN counts c ON r.range = c.bin""".stripMargin)),

    // Percentile winsorization: clip order prices to the exact [p01, p99]
    // interpolated percentiles (scalar-subquery bounds, no join); the
    // oracle recomputes the same quantile_cont clip.
    "winsorize_prices" -> Q(
      (s, dir) => Aggs.winsorize(
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice")),
        "o_totalprice", pLo = 0.01, pHi = 0.99),
      Some("""WITH b AS (SELECT quantile_cont(o_totalprice, 0.01) AS lo,
             |  quantile_cont(o_totalprice, 0.99) AS hi FROM orders)
             |SELECT o_orderkey, o_totalprice,
             |  CASE WHEN o_totalprice IS NOT NULL
             |    THEN least(greatest(o_totalprice, lo), hi) END
             |  AS o_totalprice_wins
             |FROM orders CROSS JOIN b""".stripMargin)),

    // A2 upgrade - custom HLL sketch aggregate (TypedImperativeAggregate,
    // O(2^p) mergeable register state, map-side partial merge). Unlike
    // approx_count_distinct, every arithmetic step is engine-portable, so
    // the ESTIMATE itself is oracle-checked exactly (integer bit-math
    // rank, exact integer harmonic sum, pinned double formula).
    "a2_hll_sketch" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_partkey"),
          graft.llm.TextOps.hash60(col("l_partkey").cast("string")).as("h"))
        .groupBy(col("l_returnflag"))
        .agg(
          graft.functions.SketchFunctions.hllEstimate(col("h"), 8).as("hll_est"),
          countDistinct(col("l_partkey")).as("n_exact")),
      Some {
        val alpha = graft.functions.HllSketch.alpha(256)
        s"""WITH h AS (SELECT l_returnflag, l_partkey,
           |  CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
           |  FROM lineitem),
           |b AS (SELECT l_returnflag, CAST(h >> 52 AS INT) AS bucket,
           |  h & ((CAST(1 AS BIGINT) << 52) - 1) AS w FROM h),
           |mx AS (SELECT l_returnflag, bucket,
           |  MAX(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS mj
           |  FROM b GROUP BY 1, 2),
           |regs AS (SELECT g.l_returnflag, r.range AS bucket,
           |  COALESCE(mx.mj, 0) AS mj
           |  FROM (SELECT DISTINCT l_returnflag FROM lineitem) g
           |  CROSS JOIN range(256) r
           |  LEFT JOIN mx ON mx.l_returnflag = g.l_returnflag
           |    AND mx.bucket = r.range),
           |sm AS (SELECT l_returnflag,
           |  SUM(CAST(1 AS BIGINT) << (54 - mj)) AS sv,
           |  SUM(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS zv FROM regs GROUP BY 1),
           |raw AS (SELECT l_returnflag, zv,
           |  (CAST($alpha AS DOUBLE) * CAST(65536 AS DOUBLE)
           |   * CAST(18014398509481984 AS DOUBLE)) / CAST(sv AS DOUBLE)
           |    AS raw_est
           |  FROM sm),
           |ex AS (SELECT l_returnflag,
           |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact
           |  FROM lineitem GROUP BY 1)
           |SELECT raw.l_returnflag,
           |  CASE WHEN raw_est <= 640.0 AND zv > 0
           |    THEN floor(CAST(256 AS DOUBLE)
           |      * ln(CAST(256 AS DOUBLE) / CAST(zv AS DOUBLE))
           |      * 1e6 + 0.5) / 1e6
           |    ELSE raw_est END AS hll_est,
           |  ex.n_exact
           |FROM raw JOIN ex ON raw.l_returnflag = ex.l_returnflag""".stripMargin
      }),

    // A2 - ROLLUP subtotal hierarchy.
    "a2_rollup" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
             grouping_id().cast("int").as("gid")),
      Some("""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
             |CAST(count(*) AS BIGINT) AS n,
             |CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // A2 - arbitrary GROUPING SETS (the general form; BigQuery-side
    // surface a reference user could reach beyond rollup/cube): per-flag,
    // per-status, and grand-total groupings in one Expand pass.
    "a2_grouping_sets" -> Q(
      (s, dir) => Aggs.groupingSetsAgg(Tables.lineitem(s, dir),
        dims = Seq("l_returnflag", "l_linestatus"),
        groupingSets = Seq(Seq("l_returnflag"), Seq("l_linestatus"), Seq.empty),
        aggs = Seq(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"), grouping_id().cast("int").as("gid"))),
      Some("""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
             |CAST(count(*) AS BIGINT) AS n,
             |CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)),

    // A2 - CUBE over both dims.
    "a2_cube" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
             grouping_id().cast("int").as("gid")),
      Some("""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
             |CAST(count(*) AS BIGINT) AS n,
             |CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)),

    // W2 - per-key ordered analytics: lag, 3-row moving sum, running sum,
    // row_number. Decimal measure keeps cross-engine sums exact.
    // The DDL SERIAL surrogate key (`code/sql/DDLs:3,19`) over an explicit
    // total order — the distributed two-phase prefix-sum shape, never a
    // single-partition global window (see Windows.surrogateKey scaladoc).
    "serial_surrogate_key" -> Q(
      (s, dir) => Windows.surrogateKey(
        Tables.customer(s, dir).select("c_custkey", "c_name"),
        "id", col("c_custkey")),
      Some("""SELECT c_custkey, c_name,
             |CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS id
             |FROM customer""".stripMargin)),

    "w2_keyed_window" -> Q(
      (s, dir) => Windows.keyedAnalytics(
        Tables.orders(s, dir).select(
          col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").as("price")),
        key = "o_custkey", date = "o_orderdate", tiebreak = "o_orderkey",
        measure = "price", windowRows = 3)
        .select(col("o_custkey"), col("o_orderkey"),
                col("price").cast("double").as("price"),
                col("prev_value").cast("double").as("prev_value"),
                col("moving_sum").cast("double").as("moving_sum"),
                col("running_sum").cast("double").as("running_sum"), col("rn")),
      Some("""SELECT o_custkey, o_orderkey,
             |CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
             |CAST(lag(CAST(o_totalprice AS DECIMAL(18,2))) OVER
             |  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
             |  AS prev_value,
             |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
             |  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
             |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
             |  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             |  AS running_sum,
             |CAST(row_number() OVER
             |  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS rn
             |FROM orders""".stripMargin)),

    // R1/R2 - transpose round trip: unpivot to long form, pivot back against
    // the fixed metric list (pivot . unpivot = id on unique keys).
    "r1_transpose_roundtrip" -> Q(
      (s, dir) => {
        val metrics = Seq("m_quantity", "m_discount", "m_tax")
        // (l_orderkey, l_linenumber) is not unique in the synthetic data, so
        // first reduce to unique keys with order-free aggregates.
        val base = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(min(col("l_quantity")).as("m_quantity"),
               max(col("l_discount")).as("m_discount"),
               min(col("l_tax")).as("m_tax"))
        val long = Reshape.unpivot(base, Seq("l_orderkey", "l_linenumber"),
          metrics, "metric", "value")
        Reshape.pivot(long, Seq("l_orderkey", "l_linenumber"), "metric", "value", metrics)
      },
      Some("""SELECT l_orderkey, l_linenumber, min(l_quantity) AS m_quantity,
             |max(l_discount) AS m_discount, min(l_tax) AS m_tax
             |FROM lineitem GROUP BY 1, 2""".stripMargin)))

  /** All queries, all families. */
  def all: Map[String, Q] =
    relational ++ SourceQueries.all ++ LlmQueries.all ++ CurationQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql))) => k -> sql.replace('\n', ' ') }
}
