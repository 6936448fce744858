package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CleanSpec extends SparkSpec {
  import spark.implicits._

  test("parseDateStrict keeps valid ISO dates and drops junk rows") {
    val df = Seq("2024-01-31", "not-a-date", "2023-12-01", "", "2024-02-30")
      .toDF("Date")
    val out = Clean.parseDateStrict(df, "Date")
    assert(out.as[java.sql.Date].collect().map(_.toString).sorted
      === Array("2023-12-01", "2024-01-31"))
  }

  test("numericFromGrouped strips thousands separators before the cast") {
    val df = Seq("1,234,567", "42", "9,000").toDF("v")
    val out = df.select(Clean.numericFromGrouped($"v").as("d")).as[Double]
    assert(out.collect().sorted === Array(42.0, 9000.0, 1234567.0))
  }

  test("allowlistFilter is an exact membership semi-filter") {
    val df = Seq("a", "b", "c", "a").toDF("k")
    val out = Clean.allowlistFilter(df, "k", Seq("a", "c"))
    assert(out.as[String].collect().sorted === Array("a", "a", "c"))
  }
}

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  test("skipRows drops exactly the first N physical rows in order") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList((1 to 10).map(i => Row(s"r$i")): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.StringType))))
      .coalesce(1)
    val out = Windows.skipRows(df, 4).as[String].collect()
    assert(out.sorted === (5 to 10).map(i => s"r$i").sorted.toArray)
  }

  test("keyedAnalytics lag/moving/running sums are per-key and ordered") {
    val df = Seq(
      (1L, "2024-01-01", 1L, BigDecimal(10)),
      (1L, "2024-01-02", 2L, BigDecimal(20)),
      (1L, "2024-01-03", 3L, BigDecimal(30)),
      (2L, "2024-01-01", 4L, BigDecimal(5)))
      .toDF("k", "d", "tb", "price")
      .withColumn("d", to_date($"d"))
    val out = Windows.keyedAnalytics(df, "k", "d", "tb", "price", 2)
      .orderBy("k", "tb")
      .select("k", "prev_value", "moving_sum", "running_sum", "rn")
      .collect()
    // key 1 row 2: prev=10, moving(2)=10+20, running=30
    assert(out(1).getDecimal(1).intValue() === 10)
    assert(out(1).getDecimal(2).intValue() === 30)
    assert(out(2).getDecimal(3).intValue() === 60)
    // key 2 restarts
    assert(out(3).isNullAt(1) && out(3).getInt(4) === 1)
  }
}

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  test("pivot after unpivot is the identity on unique keys") {
    val base = Seq((1L, 10.0, 0.1), (2L, 20.0, 0.2)).toDF("id", "m_a", "m_b")
    val long = Reshape.unpivot(base, Seq("id"), Seq("m_a", "m_b"), "metric", "value")
    assert(long.count() === 4)
    val wide = Reshape.pivot(long, Seq("id"), "metric", "value", Seq("m_a", "m_b"))
    assert(wide.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      === Array((1L, 10.0, 0.1), (2L, 20.0, 0.2)))
  }

  test("explode-based unpivot matches the built-in unpivot exactly " +
    "(nulls retained, mixed types coerced, schema equal)") {
    // Nulls in value columns AND a mixed int/double type pair — the two
    // semantics the round-20 Generate-based rewrite must preserve
    // against Dataset.unpivot (melt: nulls retained, least-common-type
    // cast).
    val base = Seq((1L, Some(10), Some(0.5)), (2L, None, Some(2.5)),
      (3L, Some(30), None)).toDF("id", "m_i", "m_d")
    val ours = Reshape.unpivot(base, Seq("id"), Seq("m_i", "m_d"),
      "metric", "value")
    val builtin = base.unpivot(Array(col("id")),
      Array(col("m_i"), col("m_d")), "metric", "value")
    assert(ours.schema === builtin.schema)
    val key = (r: Row) => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) null else r.getDouble(2))
    assert(ours.collect().map(key).sortBy(_.toString())
      === builtin.collect().map(key).sortBy(_.toString()))
  }

  test("unpivot->pivot of an id-partitioned frame adds no exchange " +
    "past the id partitioning (the Generate rewrite's reason to exist)") {
    val base = Seq((1L, 10.0, 0.1), (2L, 20.0, 0.2)).toDF("id", "m_a", "m_b")
      .repartition(col("id"))
    val long = Reshape.unpivot(base, Seq("id"), Seq("m_a", "m_b"),
      "metric", "value")
    val wide = Reshape.pivot(long, Seq("id"), "metric", "value",
      Seq("m_a", "m_b"))
    val exchanges = wide.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, "expected only the explicit repartition " +
      s"exchange below the unpivot; plan:\n${wide.queryExecution.executedPlan}")
  }

  test("firstRowAsHeader promotes the first physical row to column names") {
    val df = Seq(("date", "AAPL", "MSFT"), ("2024-01-01", "1.0", "2.0"),
      ("2024-01-02", "3.0", "4.0")).toDF("c0", "c1", "c2").coalesce(1)
    val out = Reshape.firstRowAsHeader(df)
    assert(out.columns === Array("date", "AAPL", "MSFT"))
    assert(out.count() === 2)
  }
}

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks the latest reference at-or-before each row's date") {
    val facts = Seq((1L, "2024-01-05"), (1L, "2024-01-10"), (2L, "2024-01-05"))
      .toDF("k", "d").withColumn("d", to_date($"d"))
    val refs = Seq((1L, "2024-01-01", 100.0), (1L, "2024-01-08", 200.0),
      (9L, "2024-01-01", 999.0))
      .toDF("k", "d", "ref").withColumn("d", to_date($"d"))
    val out = Joins.asofJoin(facts, refs, "k", "d", "ref")
      .orderBy("k", "d").select("ref").collect()
    assert(out(0).getDouble(0) === 100.0)  // 01-05 sees 01-01
    assert(out(1).getDouble(0) === 200.0)  // 01-10 sees 01-08
    assert(out(2).isNullAt(0))             // key 2 has no reference
  }
}

class PipelineSpec extends SparkSpec {
  import graft.pipeline.Pipeline

  test("withRetries retries transient failures and stops at success") {
    var calls = 0
    val out = Pipeline.withRetries(3) {
      calls += 1
      if (calls < 3) sys.error("transient") else "ok"
    }
    assert(out.isSuccess && out.get === "ok" && calls === 3)
  }

  test("withRetries exhausts and reports the final failure") {
    var calls = 0
    val out = Pipeline.withRetries(2) { calls += 1; sys.error("always") }
    assert(out.isFailure && calls === 3) // 1 initial + 2 retries
  }

  test("runStages stops at the first stage that exhausts retries") {
    val results = Pipeline.runStages(spark, Seq(
      Pipeline.Stage("ok")(_ => ()),
      Pipeline.Stage("bad", retries = 1)(_ => sys.error("boom")),
      Pipeline.Stage("never")(_ => ())))
    assert(results.map(_.name) === Seq("ok", "bad"))
    assert(results(1).attempts === 2 && results(1).error.isDefined)
  }

  test("isolateFailures skips only the failing source") {
    val (ok, failed) = Pipeline.isolateFailures(Seq(
      "good" -> (() => spark.range(3).toDF()),
      "bad" -> (() => spark.read.parquet("/nonexistent/nope.parquet"))))
    assert(ok.map(_._1) === Seq("good") && failed === Seq("bad"))
  }
}
