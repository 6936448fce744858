package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CentralitySpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String)], iters: Int = 3) =
    Centrality.pageRankFixedPoint(
      edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("hub of a star graph out-ranks the leaves") {
    // a,b,c,d all point at hub; hub points back at a.
    val edges = Seq("a" -> "hub", "b" -> "hub", "c" -> "hub", "d" -> "hub",
      "hub" -> "a")
    val r = ranksOf(edges)
    assert(r("hub") > r("a"))
    assert(r("a") > r("b"))              // a also receives the hub's mass
    assert(r("b") === r("c") && r("c") === r("d"))
    // Total mass stays below the injected total (truncation only loses).
    assert(r.values.sum <= Centrality.UnitScale)
  }

  test("symmetric cycle gives every node the identical rank") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a")
    val r = ranksOf(edges, iters = 5)
    assert(r.values.toSet.size === 1)
  }

  test("fixed-point ranks are partitioning-invariant (exact)") {
    val pairs = (0L until 400L).map(i => (s"n${i % 57}", s"n${(i * 31) % 57}"))
      .filter { case (a, b) => a != b }
    val one = Centrality.pageRankFixedPoint(
      pairs.toDF("src", "dst").coalesce(1), "src", "dst", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val many = Centrality.pageRankFixedPoint(
      pairs.toDF("src", "dst").repartition(11), "src", "dst", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one === many)
  }

  test("rejects empty edge lists and bad iteration counts") {
    intercept[IllegalArgumentException] {
      Centrality.pageRankFixedPoint(
        Seq.empty[(String, String)].toDF("src", "dst"), "src", "dst", 0)
    }
    intercept[IllegalArgumentException] {
      Centrality.pageRankFixedPoint(
        Seq.empty[(String, String)].toDF("src", "dst"), "src", "dst", 3)
    }
  }
}
