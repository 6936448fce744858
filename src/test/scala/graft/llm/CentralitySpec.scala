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

  test("triangleCounts: clique + pendant triangle, exact per-node counts, " +
    "input normalization (dups, reversals, self-loops)") {
    // 4-clique {1,2,3,4} -> C(3,2)=3 triangles per member, 4 total;
    // node 8 closes one extra triangle with 1-2; path 5-6-7 closes none.
    val clean = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (8L, 1L), (8L, 2L), (5L, 6L), (6L, 7L))
    // Noise the input: every edge also reversed, one duplicated, one loop.
    val edges = (clean ++ clean.map(_.swap) ++ Seq((1L, 2L), (6L, 6L)))
      .toDF("a", "b")
    val out = Centrality.triangleCounts(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 4L, 2L -> 4L, 3L -> 3L, 4L -> 3L, 8L -> 1L))
  }

  test("triangleCounts: star hub has zero wedge fan-out (oriented inward), " +
    "and the result is partitioning-invariant") {
    val star = (1L to 200L).map(i => (0L, i))
    assert(Centrality.triangleCounts(star.toDF("a", "b"), "a", "b")
      .count() === 0L)
    // K8: C(8,3) = 56 triangles, every node in C(7,2) = 21.
    val k8 = for (a <- 0L until 8L; b <- (a + 1) until 8L) yield (a, b)
    val one = Centrality.triangleCounts(
      k8.toDF("a", "b").coalesce(1), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Centrality.triangleCounts(
      k8.toDF("a", "b").repartition(13), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === many)
    assert(one === (0L until 8L).map(_ -> 21L).toMap)
  }

  test("clusteringCoefficient: exact ratios, degree-1 nodes report 0, " +
    "non-participants appear with 0 triangles") {
    // Clique {1,2,3,4} + node 8 on 1-2 + pendant 9 on 1.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (8L, 1L), (8L, 2L), (9L, 1L)).toDF("a", "b")
    val out = Centrality.clusteringCoefficient(edges, "a", "b")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((5L, 4L, 2.0 * 4 / (5 * 4))))
    assert(out(2L) === ((4L, 4L, 2.0 * 4 / (4 * 3))))
    assert(out(3L) === ((3L, 3L, 1.0)))
    assert(out(4L) === ((3L, 3L, 1.0)))
    assert(out(8L) === ((2L, 1L, 1.0)))
    assert(out(9L) === ((1L, 0L, 0.0)))
  }

  test("kCoreFixedRounds: cascade peel removes pendant chains round by " +
    "round; the cycle survives with exact in-core degrees") {
    // Triangle 1-2-3 with a pendant chain 3-4-5-6: each round peels one
    // chain node (6, then 5, then 4), so 3 rounds reach the true 2-core
    // and a 4th changes nothing.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L)).toDF("a", "b")
    def run(r: Int) = Centrality.kCoreFixedRounds(edges, "a", "b", 2, r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // After 1 round only the leaf 6 is gone (5 had degree 2 going in).
    assert(run(1).keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(run(3) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(run(4) === run(3)) // converged
    // k above the max degree empties the graph.
    assert(Centrality.kCoreFixedRounds(edges, "a", "b", 5, 2).count() === 0)
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

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  test("labelPropagation: two disconnected triangles converge to their " +
    "min-id labels; deterministic ties pick the smallest label") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val out = Centrality.labelPropagation(edges, "a", "b", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("labelPropagation: duplicate/reversed/self-loop edges normalize " +
    "away; negative node ids fail loud") {
    val messy = Seq(
      (2L, 1L), (1L, 2L), (2L, 3L), (3L, 3L), (1L, 3L)).toDF("a", "b")
    val out = Centrality.labelPropagation(messy, "a", "b", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))

    val bad = Seq((-1L, 2L), (2L, 3L)).toDF("a", "b")
    val e = intercept[Exception] {
      Centrality.labelPropagation(bad, "a", "b", rounds = 1)
        .collect()
    }
    assert(e.getMessage.contains("negative node id") ||
      Option(e.getCause).exists(_.getMessage.contains("negative node id")))
  }
}
