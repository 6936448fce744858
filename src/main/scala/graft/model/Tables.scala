package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver test tables under the `sf` directories (TESTDATA.md).
  *
  * All loaders are plain parquet scans so Catalyst pushdown / pruning applies
  * untouched. The one exception is `events`, whose `ts` column is physical
  * INT64 TIMESTAMP(NANOS) - a parquet type Spark 4 refuses by default. We
  * read it with `spark.sql.legacy.parquet.nanosAsLong` and convert the raw
  * nanosecond count to a microsecond TIMESTAMP_NTZ using integer floor
  * division (`div`, not `/`: long `/` long is double division in Spark and
  * epoch-nanos exceed double's exact 2^53 range), matching DuckDB's exact
  * TIMESTAMP_NS to TIMESTAMP cast so downstream operators and the oracle see
  * identical values.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Events table with `ts` normalized to TIMESTAMP_NTZ (microseconds).
    *
    * The driver has shipped this column as both physical INT64
    * TIMESTAMP(NANOS) (rounds <= 9) and plain TIMESTAMP(MICROS) (round 10+),
    * so the loader adapts to whichever physical type the scan yields:
    *
    *  - LongType: the nanos-as-long legacy read. Convert the raw nanosecond
    *    count with integer floor division (`div`, not `/`: long `/` long is
    *    double division in Spark and epoch-nanos exceed double's exact 2^53
    *    range), matching DuckDB's TIMESTAMP_NS to TIMESTAMP cast.
    *  - Timestamp(NTZ): already microseconds; just pin the NTZ type so
    *    downstream operators and the oracle see identical values either way.
    *
    * The legacy conf must be in effect both when the scan is planned and when
    * it executes; since the returned DataFrame is lazy we cannot save/restore
    * around the read. The conf only affects INT64(NANOS) parquet fields -
    * no other test table has one - so leaving it set is benign.
    *
    * BOTH normalizations go through a `cast(... as timestamp_ntz)`, which
    * renders the instant in the SESSION time zone - under any non-UTC
    * session the values would silently shift relative to the DuckDB
    * oracle. A tz-free rewrite isn't safe either (instant -> NTZ -> instant
    * round-trips are ambiguous across DST fall-backs), so the contract is
    * asserted instead: fail loud here rather than hash-mismatch later.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    val utc = try {
      java.time.ZoneId.of(tz).getRules.getOffset(java.time.Instant.EPOCH)
        .getTotalSeconds == 0 &&
        java.time.ZoneId.of(tz).getRules.isFixedOffset
    } catch { case _: java.time.DateTimeException => false }
    require(utc,
      s"Tables.events requires spark.sql.session.timeZone=UTC (got '$tz'): " +
        "the ts normalization casts through TIMESTAMP_NTZ, which renders " +
        "in the session zone and would silently shift values")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    val tsCol = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      case _ => col("ts").cast("timestamp_ntz")
    }
    raw.withColumn("ts", tsCol)
  }
}
