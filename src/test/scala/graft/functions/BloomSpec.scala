package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Curation

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("BloomAgg never yields false negatives; FP rate near theory") {
    val n = 2000
    val inserted = spark.range(n).select(
      HashFunctions.hash60(concat(lit("in-"), $"id")).as("h"))
    val bloom = inserted
      .agg(BloomFunctions.bloomAgg($"h", 1 << 15, 7).as("bf"))
    // Every inserted element must probe true.
    val misses = inserted.join(bloom)
      .filter(!BloomFunctions.bloomContains($"bf", $"h")).count()
    assert(misses === 0)
    // Disjoint probe set: FP rate for 2000 elems / 32768 bits / 7 hashes
    // is ~(1-e^(-7*2000/32768))^7 ~= 0.55% — assert a loose 3% ceiling.
    val probes = spark.range(n).select(
      HashFunctions.hash60(concat(lit("out-"), $"id")).as("h"))
    val fps = probes.join(bloom)
      .filter(BloomFunctions.bloomContains($"bf", $"h")).count()
    assert(fps.toDouble / n < 0.03, s"FP rate ${fps.toDouble / n} too high")
  }

  test("BloomAgg merges across partitions: repartitioned build is identical") {
    val df = spark.range(5000).select(
      HashFunctions.hash60($"id".cast("string")).as("h"))
    val one = df.coalesce(1)
      .agg(BloomFunctions.bloomAgg($"h", 1 << 12, 5)).head().getAs[Array[Byte]](0)
    val many = df.repartition(13)
      .agg(BloomFunctions.bloomAgg($"h", 1 << 12, 5)).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, many))
  }

  test("graft_bloom / graft_bloom_contains work from SQL") {
    GraftExtensions.register(spark)
    spark.range(100).select(HashFunctions.hash60($"id".cast("string")).as("h"))
      .createOrReplaceTempView("bloom_in")
    val row = spark.sql(
      """SELECT graft_bloom_contains(bf, graft_hash60('7')) AS hit,
        |       graft_bloom_contains(bf, graft_hash60('no-such-element-xyz')) AS miss
        |FROM (SELECT graft_bloom(h, 4096, 5) AS bf FROM bloom_in)""".stripMargin)
      .head()
    assert(row.getBoolean(0))
    assert(!row.getBoolean(1))
  }

  test("decontaminateBloom is row-identical to exact decontaminate") {
    val docs = spark.read.parquet(sf("documents"))
    val bench = docs.filter($"doc_id" % 31 === 0)
    val corpus = docs.filter($"doc_id" % 31 =!= 0)
    val exact = Curation.decontaminate(corpus, bench, "doc_id", "text", 3)
      .select($"doc_id")
    val bloomed = Curation.decontaminateBloom(corpus, bench, "doc_id", "text",
        3, bloomBits = 1 << 14, bloomHashes = 7)
      .select($"doc_id")
    assert(exact.exceptAll(bloomed).count() === 0)
    assert(bloomed.exceptAll(exact).count() === 0)
    // The prefilter must sit in the plan as a scalar-subquery Filter on
    // the probe side — NOT a cross join, which would let Catalyst
    // reorder the semi-join beneath the probe (the regression shape was
    // a BroadcastNestedLoopJoin executing AFTER the semi-join).
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains(Subquery"),
      "bloom prefilter missing or not in scalar-subquery form")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "bloom prefilter regressed to the reorderable cross-join shape")
  }
}
