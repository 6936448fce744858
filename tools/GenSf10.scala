package scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-time sf10 generator (the second scale-rehearsal decade):
  * replicate the sf0.1 fact tables 100x with shifted keys, same
  * playbook as [[GenSf1]] — document texts get a per-replica token
  * suffix so the duplicate RATE stays that of sf0.1 instead of creating
  * artificial 100-wide exact-dup clusters. ~60M lineitem / 500k docs /
  * 200k vectors — the first size where a super-linear stage cannot hide
  * behind fixed plan/JIT overheads. Output: /tmp/graft_sf10.
  */
object GenSf10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"; val dst = "/tmp/graft_sf10"
    val R = 100
    val rep = explode(array((0 until R).map(lit): _*)).as("rep")

    def fan(t: String) = spark.read.parquet(s"$src/$t.parquet").select(col("*"), rep)

    fan("orders")
      .withColumn("o_orderkey", col("o_orderkey") + col("rep").cast("long") * 1000000L)
      .drop("rep").repartition(32)
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")
    fan("lineitem")
      .withColumn("l_orderkey", col("l_orderkey") + col("rep").cast("long") * 1000000L)
      .drop("rep").repartition(32)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    fan("events")
      .withColumn("event_id", col("event_id") + col("rep").cast("long") * 1000000L)
      .withColumn("user_id", col("user_id") + col("rep").cast("long") * 10000L)
      .drop("rep").repartition(32)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    fan("documents")
      .withColumn("doc_id", col("doc_id") + col("rep").cast("long") * 1000000L)
      .withColumn("text",
        when(col("rep") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1r"), col("rep").cast("string")))))
      .drop("rep").repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    fan("embeddings")
      .withColumn("vec_id", col("vec_id") + col("rep").cast("long") * 1000000L)
      .drop("rep").repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    println("GENSF10 done")
    spark.stop()
  }
}
