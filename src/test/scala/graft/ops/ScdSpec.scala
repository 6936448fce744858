package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2FromChangeLog collapses runs into closed/open intervals") {
    val log = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "bronze"),
      (1L, 2L, ts("2024-02-01 00:00:00"), "bronze"),
      (1L, 3L, ts("2024-03-01 00:00:00"), "silver"),
      (1L, 4L, ts("2024-04-01 00:00:00"), "bronze"),
      (2L, 5L, ts("2024-01-15 00:00:00"), "gold")
    ).toDF("k", "seq", "at", "tier")
    val out = Scd.scd2FromChangeLog(log, "k", "tier", "at", "seq")
      .orderBy("k", "version").collect()
    assert(out.length === 4)
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(2)).toSeq === Seq("bronze", "silver", "bronze"))
    assert(k1.map(_.getInt(1)).toSeq === Seq(1, 2, 3))
    // First run spans both bronze rows; closes at the silver start.
    assert(k1(0).getTimestamp(3) === ts("2024-01-01 00:00:00"))
    assert(k1(0).getTimestamp(4) === ts("2024-03-01 00:00:00"))
    assert(!k1(0).getBoolean(5))
    // Open run: null valid_to, is_current.
    assert(k1(2).isNullAt(4) && k1(2).getBoolean(5))
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length === 1 && k2(0).getBoolean(5))
  }

  test("scd2FromChangeLog intervals tile each key's timeline exactly") {
    val events = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"event_id", $"ts", $"event_type")
    val scd = Scd.scd2FromChangeLog(events, "user_id", "event_type",
      "ts", "event_id")
    // Each interval's valid_to equals the next version's valid_from, the
    // version sequence is 1..n, and row count equals the number of
    // event_type changes + first rows.
    val bad = scd.withColumn("next_from",
        lead($"valid_from", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"version")))
      .filter(($"valid_to".isNotNull && $"valid_to" =!= $"next_from") ||
        ($"valid_to".isNull && $"next_from".isNotNull))
    assert(bad.count() === 0)
    val perUser = scd.groupBy("user_id")
      .agg(count(lit(1)).as("n"), max($"version").as("maxv"),
        sum(when($"is_current", 1).otherwise(0)).as("open"))
    assert(perUser.filter($"n" =!= $"maxv" || $"open" =!= 1).count() === 0)
  }

  test("upsert replaces matched keys, appends new ones, keeps the rest") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val updates = Seq((2L, "b2", 21.0), (9L, "z", 90.0)).toDF("k", "name", "v")
    val merged = Scd.upsert(target, updates, Seq("k"))
      .orderBy("k").collect()
    assert(merged.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      === Seq((1L, "a", 10.0), (2L, "b2", 21.0), (3L, "c", 30.0), (9L, "z", 90.0)))
  }
}
