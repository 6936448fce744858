package scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-time sf100 generator (the THIRD scale-rehearsal decade):
  * replicate the sf10 fact tables 10x with shifted keys — the
  * [[GenSf10]] playbook, one decade up. Document texts get a second
  * per-replica token suffix layer ("sN" on top of sf10's "rN"), which
  * keeps the shingle/gram df distribution constant per replica, so the
  * duplicate RATE and candidate-pair mass stay those of sf0.1 scaled
  * linearly (the property the sf1/sf10 DuckDB mass checks verified).
  * ~600M lineitem / 100M events / 5M docs / 2M vectors, ~16 GB parquet.
  * Output: /tmp/graft_sf100. Run GenSf10 first.
  */
object GenSf100 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/tmp/graft_sf10"; val dst = "/tmp/graft_sf100"
    val R = 10
    val rep = explode(array((0 until R).map(lit): _*)).as("rep")

    def fan(t: String) = spark.read.parquet(s"$src/$t.parquet").select(col("*"), rep)

    // Key strides sit one decade above sf10's maxima (sf10 shifted by
    // rep*1e6 over 100 replicas, so ids reach ~1e8; 1e9 clears them).
    fan("orders")
      .withColumn("o_orderkey", col("o_orderkey") + col("rep").cast("long") * 1000000000L)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")
    fan("lineitem")
      .withColumn("l_orderkey", col("l_orderkey") + col("rep").cast("long") * 1000000000L)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    fan("events")
      .withColumn("event_id", col("event_id") + col("rep").cast("long") * 1000000000L)
      .withColumn("user_id", col("user_id") + col("rep").cast("long") * 10000000L)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    fan("documents")
      .withColumn("doc_id", col("doc_id") + col("rep").cast("long") * 1000000000L)
      .withColumn("text",
        when(col("rep") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1s"), col("rep").cast("string")))))
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    fan("embeddings")
      .withColumn("vec_id", col("vec_id") + col("rep").cast("long") * 1000000000L)
      .drop("rep").repartition(64)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    println("GENSF100 done")
    spark.stop()
  }
}
