package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Materialize

/** Link-graph centrality — the corpus-quality prior large web-corpus
  * curation pipelines attach to documents (page rank / harmonic
  * centrality over the link graph decides crawl depth and quality
  * weighting; the same shape serves transaction and citation graphs).
  *
  * Arithmetic contract: ranks are INTEGER FIXED-POINT (units of 1e-12,
  * `UnitScale`), every step a truncating integer division or an exact
  * long sum. A floating-point PageRank can never be exact-oracle-checked
  * — double summation order varies with partitioning — but integer sums
  * are associative-commutative-exact, so the whole iteration is
  * bit-reproducible across engines, reruns, and partitionings, and the
  * query hash-matches a DuckDB twin that unrolls the same iterations
  * (`//` and `div` both truncate toward zero for non-negative operands).
  */
object Centrality {

  /** 1.0 of rank mass in fixed-point units. With damping 0.85 a node's
    * rank is bounded by ~N·UnitScale; longs overflow only past ~10^6
    * nodes × UnitScale — callers at larger N should shrink the scale.
    */
  val UnitScale: Long = 1000000000000L

  /** `iters` rounds of damped (0.85) PageRank over a directed edge list.
    * Fixed iteration count, no convergence probe — the oracle unrolls
    * exactly the same rounds. Dangling-node mass is dropped (standard
    * simplification; the base term keeps every node > 0). Returns
    * `(node, rank)` with rank in [[UnitScale]] units.
    *
    * Scale shape (the Pregel loop as dataflow): edges are de-duplicated,
    * hash-partitioned on `src` ONCE and pinned via `mat` — each round
    * then shuffles only the (node, rank) frame to that layout, takes one
    * map-side-combined sum per destination, and left-joins back onto the
    * pinned node list. Per round: 2 data-scale shuffles (ranks→src,
    * contribs→dst), lineage kept flat by per-round materialization.
    */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
                         iters: Int,
                         mat: Materialize = Materialize.Local): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    def matStep(step: String): DataFrame => DataFrame = mat match {
      case Materialize.Path(dir) => Materialize.Path(s"$dir/$step").apply
      case other                 => other.apply
    }
    val e = matStep("edges")(edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .repartition(col("src")))
    val deg = matStep("deg")(e.groupBy("src").agg(count(lit(1)).as("deg")))
    val nodes = matStep("nodes")(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    // One driver-side scalar (the node count) parameterizes the constant
    // terms — the same number the oracle derives from its own count().
    val n = nodes.count()
    require(n > 0, "pageRankFixedPoint: empty edge list")
    val base = (15L * (UnitScale / n)) / 100L
    var ranks = matStep("r0")(nodes.withColumn("rank", lit(UnitScale / n)))
    for (i <- 1 to iters) {
      val contribs = e
        .join(deg, Seq("src"))
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .selectExpr("dst", "rank div deg AS contrib")
        .groupBy("dst").agg(sum(col("contrib")).as("contrib"))
      ranks = matStep(s"r$i")(
        nodes.join(contribs, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(base) +
              expr("85 * coalesce(contrib, cast(0 as bigint)) div 100"))
              .as("rank")))
    }
    ranks
  }

  /** Per-node triangle participation counts over an UNDIRECTED graph:
    * `(node, n_triangles)` for every node in at least one triangle.
    * Triangle density is the classic graph-cohesion signal (clustering
    * coefficient numerator) — over a co-purchase / co-citation / link
    * graph it separates genuinely clustered neighborhoods from hub
    * noise, which degree alone cannot.
    *
    * Input edges may carry duplicates, self-loops, or both directions;
    * they are normalized to simple `a < b` edges first.
    *
    * Scale shape — the degree-ordered wedge join (the MapReduce triangle
    * pattern of Suri–Vassilvitskii / Cohen, public): each edge is
    * ORIENTED from its (degree, id)-smaller endpoint to the larger, so
    * every triangle has exactly one apex with out-edges to the other two
    * and is found exactly once. The payoff is skew-proofing: a node's
    * wedge fan-out is its OUT-degree, which the orientation bounds by
    * O(√m) regardless of raw degree — the celebrity hub that makes the
    * naive neighbor-pair explosion quadratic never enumerates its
    * pairs, because all its edges point INTO it. Three shuffles total
    * (degree agg, wedge self-join on the apex, closing equi-join on the
    * (u,v) pair); nothing is ever all-pairs.
    */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String,
                     mat: Materialize = Materialize.Local): DataFrame =
    triangleCountsOn(canonicalEdges(edges, aCol, bCol, mat), mat)

  /** Simple undirected edges: canonical a < b, self-loops dropped.
    * Pinned: the frame feeds the degree union (twice) and the
    * orientation join — without the pin every consumer would re-run
    * the caller's whole edge-construction pipeline.
    */
  private def canonicalEdges(edges: DataFrame, aCol: String, bCol: String,
                             mat: Materialize): DataFrame =
    mat(edges.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct())

  /** [[triangleCounts]] over an ALREADY-canonical pinned edge frame
    * `(a, b)` — the entry [[clusteringCoefficient]] uses so its shared
    * frame is normalized and pinned exactly once.
    */
  private def triangleCountsOn(e0: DataFrame,
                               mat: Materialize): DataFrame = {
    val deg = e0.select(col("a").as("n")).union(e0.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // Orient by the (degree, id) total order; a < b already, so ties go
    // a → b. Carry the head's degree: wedge pairs below are ordered by
    // the SAME key, so the closing edge is probed in its stored
    // orientation — no double lookup.
    val ori = mat(e0
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("src"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("dst"),
        when(col("da") <= col("db"), col("db")).otherwise(col("da")).as("dd"))
      .repartition(col("src")))
    val wedges = ori.select(col("src"), col("dst").as("u"), col("dd").as("du"))
      .join(ori.select(col("src"), col("dst").as("v"), col("dd").as("dv")),
        Seq("src"))
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select(col("src").as("w"), col("u"), col("v"))
    val tris = wedges.join(
      ori.select(col("src").as("u"), col("dst").as("v")), Seq("u", "v"))
    tris.select(explode(array(col("w"), col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Fixed-round k-core peel: `rounds` iterations of "drop every node
    * with degree < k (and its edges)", then the surviving nodes with
    * their in-subgraph degree. The density-core extraction of graph
    * curation (a 2-core keeps only nodes on cycles — boilerplate link
    * rings, co-purchase cliques); run to a fixed round count, not
    * convergence, so the oracle can unroll the identical rounds (the
    * [[pageRankFixedPoint]] convention — after `rounds` passes the
    * result is the true k-core iff a pass removed nothing, which the
    * caller can check by comparing consecutive-round outputs).
    *
    * Scale shape: each round is one map-side-combined degree aggregate
    * plus two semi-joins of the edge frame against the (node-cardinality)
    * survivor list — O(rounds) shuffles, each bounded by the shrinking
    * edge frame; nothing quadratic, no windows. Edge frames are pinned
    * per round to keep lineage flat.
    *
    * @return (node, degree) for nodes surviving all `rounds` passes
    */
  def kCoreFixedRounds(edges: DataFrame, aCol: String, bCol: String,
                       k: Int, rounds: Int,
                       mat: Materialize = Materialize.Local): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1 && rounds <= 20, s"rounds must be in [1, 20], got $rounds")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("node")).union(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
    var e = mat(edges.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("degree") >= k).select(col("node"))
      e = mat(e
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi"))
    }
    degrees(e)
  }

  /** Local clustering coefficient per node:
    * `2 · triangles(v) / (deg(v) · (deg(v) − 1))` — the fraction of a
    * node's neighbor pairs that are themselves connected. The per-node
    * cohesion ratio on top of [[triangleCounts]]; degree-1 nodes (no
    * neighbor pair to close) report 0. One extra degree aggregate and a
    * left join over the triangle frame; the wedge-join cost dominates
    * and is inherited unchanged.
    *
    * @return (node, degree, n_triangles, clustering)
    */
  def clusteringCoefficient(edges: DataFrame, aCol: String, bCol: String,
                            mat: Materialize = Materialize.Local): DataFrame = {
    // Normalized and pinned exactly once; both the degree union and the
    // triangle core consume the same materialization.
    val e0 = canonicalEdges(edges, aCol, bCol, mat)
    val deg = e0.select(col("a").as("node")).union(e0.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    deg.join(triangleCountsOn(e0, mat), Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("clustering",
        when(col("degree") < 2, lit(0.0))
          .otherwise((lit(2L) * col("n_triangles")).cast("double") /
            (col("degree") * (col("degree") - lit(1L))).cast("double")))
  }

  /** Synchronous label propagation for `rounds` rounds — the linear-time
    * community detector (Raghavan et al. 2007, public): every node
    * starts labeled with its own id; each round it adopts the label
    * most frequent among its neighbors. Communities emerge as labels
    * that saturate dense regions, which curation pipelines use to group
    * near-duplicate *sources* (mirrors, scraper farms) the document-level
    * dedup family can't see.
    *
    * Determinism contract: classic LPA breaks count ties RANDOMLY, which
    * can never hash-match anything. Here ties break on the SMALLEST
    * label (argmax over (count, -label) as a struct max — one exact
    * aggregate, no window sort), and rounds are synchronous, so the
    * whole evolution is a pure function of the edge set and the oracle
    * unrolls the identical rounds.
    *
    * Scale shape per round: one edges⋈labels shuffle (partitioned by
    * node) + one map-side-combined (node, label) count + one struct-max
    * per node — message volume is |E|, never all-pairs, and a hub's
    * messages combine map-side before they travel. Node ids must be
    * NON-NEGATIVE longs (the struct-max negation trick needs a total
    * order that survives negation; enforced fail-loud).
    *
    * @return (node, label) after `rounds` synchronous rounds
    */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
                       rounds: Int,
                       mat: Materialize = Materialize.Local): DataFrame = {
    require(rounds >= 1 && rounds <= 50,
      s"rounds must be in [1, 50], got $rounds")
    def matStep(step: String): DataFrame => DataFrame = mat match {
      case Materialize.Path(dir) => Materialize.Path(s"$dir/$step").apply
      case other                 => other.apply
    }
    val simple = canonicalEdges(edges, aCol, bCol, mat)
    val guard = when(col("a") < 0L,
        raise_error(concat(lit("labelPropagation: negative node id "),
          col("a").cast("string"))))
      .otherwise(col("a"))
    // Both directions: each undirected edge carries messages both ways.
    val sym = matStep("sym")(simple
      .select(guard.as("src"), col("b").as("dst"))
      .union(simple.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src")))
    var labels = matStep("l0")(
      sym.select(col("src").as("node")).distinct()
        .withColumn("label", col("node")))
    for (i <- 1 to rounds) {
      val counts = sym
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      labels = matStep(s"l$i")(counts
        .groupBy(col("dst"))
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("m"))
        .select(col("dst").as("node"), (-col("m.neg")).as("label")))
    }
    labels
  }
}
