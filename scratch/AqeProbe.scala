package scratch
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Round-11 probe for the AQE byte-sizing toggle (verdict item 7): runs a
  * query set at sf10 under either the pinned partitions=cores layout or
  * the SPARK_GRAFT_AQE_BYTES cluster posture (mirroring Bench's builder
  * exactly), with a stage listener accumulating spill per query — the r10
  * finding to beat is r1_transpose spilling 32 GB mem + 4.7 GB disk at 32
  * partitions, zero at a hand-picked 128. Pass criteria: AQE-bytes gives
  * r1 zero spill WITHOUT the hand pick, and no query in the set regresses
  * >2x vs the pinned run measured in the same window.
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 [SPARK_GRAFT_AQE_BYTES=1]
  *   SPARK_GRAFT_ONLY=r1_transpose_roundtrip,... runMain scratch.AqeProbe
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val aqeBytes = sys.env.get("SPARK_GRAFT_AQE_BYTES").map {
      case "1" | "true" => "64m"
      case v => v
    }
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val builder = aqeBytes match {
      case Some(target) => b0
        .config("spark.sql.shuffle.partitions",
          graft.Bench.derivePreCoalesce(sfDir, target, cpus.toInt).toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", target)
      case None => b0
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var memSpill = 0L
    @volatile var diskSpill = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        memSpill += s.stageInfo.taskMetrics.memoryBytesSpilled
        diskSpill += s.stageInfo.taskMetrics.diskBytesSpilled
      }
    })
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY",
      "r1_transpose_roundtrip").split(",").toSeq
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt)
    // Index warmup is skippable (SPARK_GRAFT_WARMUP=off) for probe sets
    // that touch no write-time index: at sf100 prepareIndexes would
    // spend tens of minutes building ANN/hash layouts the probe never
    // reads.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "on") != "off")
      try graft.queries.LlmQueries.prepareIndexes(spark, sfDir)
      catch { case _: Throwable => () }
    val mode = aqeBytes.map(t => s"aqe:$t").getOrElse(s"pinned:$cpus")
    for (name <- only if SparkEntry.queries.contains(name)) {
      val fn = SparkEntry.queries(name)
      var best = Double.MaxValue
      var bm = 0L; var bd = 0L
      for (_ <- 1 to reps) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        // Nudge the ContextCleaner: shuffle files of finished queries
        // are GC-triggered, and at sf100 a probe's accumulated shuffle
        // dirs (tens of GB each) would otherwise fill the local-dir
        // disk before the JVM exits.
        System.gc()
        memSpill = 0L; diskSpill = 0L
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < best) { best = sec; bm = memSpill; bd = diskSpill }
      }
      println(f"PROBE mode=$mode q=$name min_sec=$best%.3f " +
        f"spill_mem_mb=${bm / 1024 / 1024} spill_disk_mb=${bd / 1024 / 1024}")
    }
    spark.stop()
  }
}
