package scratch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Similarity
import graft.model.Tables
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("P_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); np <- Seq(3, 5)) {
      val dir = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, dir)
      val q = emb.filter(col("vec_id") < 10)
      val rec = Similarity.recallAtK(
        Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5),
        Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 5, nCells = 10, nProbe = np),
        k = 5)
      val rows = rec.orderBy("query_id").collect()
        .map(r => s"${r.getLong(0)}:${r.getDouble(1)}").mkString(" ")
      println(s"PROBE cpus=$cpus np=$np $sf $rows")
    }
    spark.stop()
  }
}
