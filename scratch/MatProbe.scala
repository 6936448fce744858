package scratch

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Round-19 paired materialization A/B: times each SPARK_GRAFT_ONLY query
  * under the three signature-frame treatments (none / pin / share)
  * INTERLEAVED inside ONE JVM, so JIT and page-cache warmth hit every
  * variant equally — the sequential single-shot probes this round swung
  * 2-5x on identical code, which is what this harness exists to defeat.
  * One untimed warmup execution first; then SPARK_GRAFT_ROUNDS (default
  * 3) rounds of none,pin,share. Prints per-execution and per-variant
  * min/median.
  *
  * The variant is selected via the system property named by
  * SPARK_GRAFT_MATPROP (default `graft.probe.mat`), which the operator
  * under test must TEMPORARILY read at the materialization site — the
  * round-19 runs wired it into `Dedup.hammingNearDupPairsWide` (the
  * narrow signature frame) and `CrossModal.pairContamination` (the keys
  * frame); the switches were removed once the decision landed (the
  * library keeps no runtime plan knobs), so AS COMMITTED this harness
  * times three identical plans. To reproduce a verdict, re-wire the
  * materialization site under test to read the property, e.g. in
  * `pairContamination`:
  * {{{
  *   val keys = sys.props.getOrElse("graft.probe.mat", "pin") match {
  *     case "none"  => captionKeys.select(col(idCol), col(keyCol))
  *     case "share" => captionKeys.select(col(idCol), col(keyCol)).persist()
  *     case _       => graft.ops.Materialize.pin(
  *                       captionKeys.select(col(idCol), col(keyCol)))
  *   }
  * }}}
  * (the round-19 switches rode exactly this shape; they lived only in
  * the working tree, never in a commit). Measured verdicts are recorded
  * in the operators' scaladocs and BASELINE.md.
  */
object MatProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "llm_image_neardup_wide")
      .split(",").toSeq
    val variants = Seq("none", "pin", "share")
    for (name <- only if SparkEntry.queries.contains(name)) {
      val fn = SparkEntry.queries(name)
      def runOnce(variant: String): Double = {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
        sys.props(sys.env.getOrElse("SPARK_GRAFT_MATPROP", "graft.probe.mat")) = variant
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      runOnce("none") // untimed warmup
      val acc = collection.mutable.Map[String, Vector[Double]]()
        .withDefaultValue(Vector())
      for (r <- 1 to rounds; v <- variants) {
        val s = runOnce(v)
        acc(v) = acc(v) :+ s
        println(f"MAT q=$name round=$r variant=$v sec=$s%.3f")
      }
      for (v <- variants) {
        val xs = acc(v).sorted
        println(f"MATSUMMARY q=$name variant=$v min=${xs.head}%.3f " +
          f"median=${xs(xs.size / 2)}%.3f all=${acc(v).map(x => f"$x%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
