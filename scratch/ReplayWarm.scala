package graft.queries

import org.apache.spark.sql.SparkSession

/** Round-20: build ONLY the fixture artifacts the sf100 ingest replay
  * needs (KN LM, quality classifier, drift reference) under the
  * derived-AQE posture — the replay probe's own 64-partition session
  * OOMs building the sf100 KN LM, and the full prepareIndexes sweep
  * builds shingle-carrying layouts the replay never reads (the text
  * near-dup index alone overflows the probe machine's disk at sf100).
  */
object ReplayWarm {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        graft.Bench.derivePreCoalesce(sfDir, "64m", cpus.toInt).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(body: => String): Unit = {
      val t0 = System.nanoTime()
      val p = body
      println(f"PROBE $label sec=${(System.nanoTime() - t0) / 1e9}%.1f path=$p")
    }
    t("knlm") { LlmQueries.ensureKnLm(spark, sfDir) }
    t("clf") { CurationQueries.ensureClfModel(spark, sfDir) }
    t("driftref") { LlmQueries.ensureDriftRef(spark, sfDir) }
    println("REPLAYWARM done")
    spark.stop()
  }
}
