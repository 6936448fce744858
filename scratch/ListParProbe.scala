package graft.llm
import org.apache.spark.sql.SparkSession
/** Round-20: does capping the parallel partition-discovery task count
  * at cluster parallelism collapse the per-probe relation-construction
  * cost of a many-directory banded layout? */
object ListParProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nearIdx = "/tmp/kernel_pin_probe/near"
    val key = "spark.sql.sources.parallelPartitionDiscovery.parallelism"
    for (par <- Seq("10000", "64", "32", "10000", "64"); rep <- 1 to 2) {
      spark.conf.set(key, par)
      val t0 = System.nanoTime()
      val df = spark.read.parquet(nearIdx)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE par=$par rep=$rep construct_sec=$dt%.2f files=${df.inputFiles.length}")
    }
    spark.stop()
  }
}
