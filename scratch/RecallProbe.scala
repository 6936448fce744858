package scratch

import org.apache.spark.sql.SparkSession

/** Round-17 recall-decade probe: run the llm_lsh_recall_auto contract
  * query at the given SF dir and print the measured recall row plus the
  * sidecar-resolved (planes, tables) layout — the recall-vs-corpus
  * datapoints BASELINE.md records for the recall-compensated auto-LSH
  * fix (verdict r16 #1). Also times the query (reps via
  * SPARK_GRAFT_REPS) so the decade's wall cost is captured in the same
  * run.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
  *   sbt 'set Compile/unmanagedSourceDirectories += file("scratch"); runMain scratch.RecallProbe'
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fix = graft.queries.LlmQueries.ensureLshIndexAuto(spark, sfDir)
    val planes = graft.llm.Similarity.lshIndexPlanes(spark, fix)
    val tables = graft.llm.Similarity.lshIndexTables(spark, fix)
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    println(s"PROBE sf=$sfDir vectors=$n planes=$planes tables=$tables")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt)
    for (name <- Seq("llm_lsh_recall_auto", "llm_lsh_multiprobe_recall")) {
      val fn = graft.SparkEntry.queries(name)
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).collect()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        rows.foreach(r => println(s"PROBE $name result $r"))
      }
      println(f"PROBE $name best_sec=$best%.3f")
    }
    spark.stop()
  }
}
