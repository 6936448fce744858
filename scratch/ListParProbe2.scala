package graft.llm
import org.apache.spark.sql.SparkSession
/** sf0.1-sized twin of ListParProbe: does the parallelism cap (or the
  * scoped conf set/restore itself) change relation-construction cost
  * at the SMALL layouts the sf0.1 bench reads? Alternates default /
  * capped / readLayout on one sf0.1 fixture layout. */
object ListParProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = args.headOption.getOrElse(
      sys.env("GRAFT_PROBE_PATH"))
    val key = "spark.sql.sources.parallelPartitionDiscovery.parallelism"
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"PROBE $label sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    for (r <- 1 to 4) {
      spark.conf.set(key, "10000")
      t(s"default_r$r") { spark.read.parquet(path).inputFiles.length }
      t(s"readLayout_r$r") { BandedIndex.readLayout(spark, path).inputFiles.length }
    }
    spark.stop()
  }
}
