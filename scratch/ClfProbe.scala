package scratch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Curation, TextOps}
object ClfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .withColumn("is_ref",
        array_contains(TextOps.tokens(col("text")), "spark").cast("int"))
    for ((lr, iters) <- Seq((5.0, 8), (4.0, 10), (5.0, 10), (5.0, 12), (6.0, 10))) {
      val m = Curation.trainQualityClassifier(docs, "doc_id", "text",
        "is_ref", iters = iters, lr = lr)
      val sc = Curation.scoreQualityClassifier(docs, m, "doc_id", "text")
      val acc = sc.join(docs.select(col("doc_id"), col("is_ref")), Seq("doc_id"))
        .agg(avg((col("pred") === col("is_ref")).cast("int")).as("acc"),
          sum(col("pred")).as("n_pred1")).collect()(0)
      println(f"PROBE lr=$lr iters=$iters acc=${acc.getDouble(0)}%.3f n_pred1=${acc.getLong(1)}")
    }
    spark.stop()
  }
}
