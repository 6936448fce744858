package scratch
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.llm.Curation

/** Round-11 probe: attribute bpe_train's sf10/sf1 ratio (7.4x for 10x
  * data — the worst recorded sf10 ratio, BASELINE.md sf10 row) to a
  * specific loop stage. Runs bpeTrain at nMerges = 1, 2, 3 on both
  * scales; the DELTAS isolate per-round cost (round 1 includes the
  * initial tokenization + first pair count; each later round adds one
  * merge-apply + one pair count over the checkpointed stream). A
  * listener accumulates spill so a memory cliff can't hide in wall
  * time. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 runMain scratch.BpeProbe
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var memSpill = 0L
    @volatile var diskSpill = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        memSpill += s.stageInfo.taskMetrics.memoryBytesSpilled
        diskSpill += s.stageInfo.taskMetrics.diskBytesSpilled
      }
    })
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // Warm IO/codegen once so nMerges=1's first rep is not the JVM tax.
    docs.groupBy().count().collect()
    val reps = 2
    for (n <- 1 to 3) {
      var best = Double.MaxValue
      var bm = 0L; var bd = 0L
      for (_ <- 1 to reps) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        memSpill = 0L; diskSpill = 0L
        val t0 = System.nanoTime()
        Curation.bpeTrain(docs, "doc_id", "text", nMerges = n)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < best) { best = sec; bm = memSpill; bd = diskSpill }
      }
      println(f"PROBE sf=$dir nMerges=$n min_sec=$best%.3f " +
        f"spill_mem_mb=${bm / 1024 / 1024} spill_disk_mb=${bd / 1024 / 1024}")
    }
    // Partitioning-reuse audit: bpeEncode's final plan is the re-densify
    // window over the LAST round's localCheckpoint. If the checkpoint
    // preserves the (id)-hash partitioning + (id, pos) ordering the merge
    // windows established, this plan needs ZERO Exchanges (the same holds
    // for every round's windows over the prior checkpoint); an Exchange
    // here means every round re-shuffles the full token stream.
    val enc = Curation.bpeEncode(docs.limit(1000), "doc_id", "text", 2)
    val plan = enc.queryExecution.executedPlan.toString
    val nExch = "Exchange".r.findAllIn(plan).length
    val nSort = "Sort ".r.findAllIn(plan).length
    println(s"PROBE final_window_exchanges=$nExch final_window_sorts=$nSort")
    spark.stop()
  }
}
