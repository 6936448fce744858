package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.model.Schemas
import graft.queries.Queries

/** The two remaining reference DDL tables (`code/sql/DDLs:18-29,165-170`):
  * schema constants match the declared types, and their registered queries
  * produce the closed-form values the fixtures embed.
  */
class WarehouseTablesSpec extends SparkSpec {

  test("analystRecommendations schema mirrors ANALYSTRECCOMENDATIONS DDL") {
    val s = Schemas.analystRecommendations
    assert(s.fieldNames.toSeq === Seq(
      "Date", "Period", "StrongBuy", "Buy", "Hold", "Sell", "StrongSell",
      "Ticker"))
    assert(s("Date").dataType === DateType)
    assert(Seq("StrongBuy", "Buy", "Hold", "Sell", "StrongSell")
      .forall(s(_).dataType === IntegerType))
    assert(s("Period").dataType === StringType)
    assert(s("Ticker").dataType === StringType && !s("Ticker").nullable)
  }

  test("dividendHistory schema mirrors DIVIDEND_HISTORY DDL") {
    val s = Schemas.dividendHistory
    assert(s.fieldNames.toSeq === Seq("Ticker", "Date", "Dividends"))
    assert(s("Dividends").dataType === DecimalType(20, 2))
    assert(!s("Ticker").nullable && !s("Date").nullable)
  }

  test("analyst_trend: closed-form consensus trend for the first ticker") {
    val out = Queries.queries("analyst_trend")(spark, "/root/testdata/sf0.001")
      .filter(col("Ticker") === "ALPHA").collect()
    assert(out.length === 1)
    val r = out.head
    // ti = 0: 0m bull = (0+0+1) + (0+0) = 1, total = 1+0+3+1+0 = 5;
    //         -3m bull = 4 + 3 = 7, total = 4+3+9+4+0 = 20.
    assert(r.getAs[Long]("bull_now") === 1L)
    assert(r.getAs[Long]("total_now") === 5L)
    assert(r.getAs[Long]("bull_prior") === 7L)
    assert(r.getAs[Long]("total_prior") === 20L)
    assert(r.getAs[Long]("n_periods") === 4L)
    assert(math.abs(r.getAs[Double]("trend") - (1.0 / 5 - 7.0 / 20)) < 1e-12)
  }

  test("Tables.events fails loud under a non-UTC session time zone") {
    val key = "spark.sql.session.timeZone"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "America/New_York")
      val e = intercept[IllegalArgumentException] {
        graft.model.Tables.events(spark, "/root/testdata/sf0.001")
      }
      assert(e.getMessage.contains("session.timeZone"))
    } finally spark.conf.set(key, saved)
    // UTC-equivalent fixed offsets are accepted.
    assert(graft.model.Tables.events(spark, "/root/testdata/sf0.001")
      .schema("ts").dataType.typeName === "timestamp_ntz")
  }

  test("dividend_asof: null before first ex-date, quarterly step after") {
    val rows = Queries.queries("dividend_asof")(spark, "/root/testdata/sf0.001")
      .filter(col("Ticker") === "BRAVO") // ti = 1 -> base 50 cents
      .orderBy(col("Date")).collect()
    assert(rows.length === 12)
    assert(rows.head.isNullAt(rows.head.fieldIndex("Dividends"))) // January
    // Feb..Apr month-ends cover q0 (0.50); May..Jul q1 (0.51);
    // Aug..Oct q2 (0.52); Nov..Dec q3 (0.53).
    val want = Seq(0.50, 0.50, 0.50, 0.51, 0.51, 0.51, 0.52, 0.52, 0.52,
      0.53, 0.53)
    val got = rows.tail.map(_.getAs[Double]("Dividends")).toSeq
    assert(got === want)
  }
}
