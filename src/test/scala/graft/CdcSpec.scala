package graft

import org.apache.spark.sql.functions._

import graft.ops.Cdc

class CdcSpec extends SparkSuite {

  test("applyChangelog: last upsert wins; tombstone deletes; key can recover") {
    import spark.implicits._
    val log = Seq(
      (1L, 1L, "upsert", 10.0), (1L, 2L, "upsert", 20.0), // latest wins
      (2L, 3L, "upsert", 5.0), (2L, 4L, "delete", 0.0), // tombstoned out
      (3L, 5L, "delete", 0.0), (3L, 6L, "upsert", 7.0) // delete then re-insert
    ).toDF("key", "seq", "typ", "v")
    val out = Cdc.applyChangelog(log, Seq("key"), Seq("seq"),
      tombstone = col("typ") === "delete")
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 2L, "upsert", 20.0), (3L, 6L, "upsert", 7.0)), out.toSeq)
  }

  test("applyChangelog: order-column suffix breaks same-timestamp ties") {
    import spark.implicits._
    val log = Seq(
      (1L, 100L, 1L, "a"), (1L, 100L, 2L, "b"), // same ts — id 2 is later
      (2L, 100L, 4L, "c"), (2L, 200L, 3L, "d") // later ts beats larger id
    ).toDF("key", "ts", "id", "v")
    val out = Cdc.applyChangelog(log, Seq("key"), Seq("ts", "id"),
      tombstone = lit(false))
      .orderBy("key").collect().map(r => (r.getLong(0), r.getString(3)))
    assert(out.toSeq == Seq((1L, "b"), (2L, "d")), out.toSeq)
  }

  test("applyChangelog guards: empty key/order columns fail fast") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("key", "seq")
    intercept[IllegalArgumentException] {
      Cdc.applyChangelog(df, Seq.empty, Seq("seq"), lit(false))
    }
    intercept[IllegalArgumentException] {
      Cdc.applyChangelog(df, Seq("key"), Seq.empty, lit(false))
    }
  }

  test("applyChangelog: NULL tombstone on the winning row deletes the key (3VL contract)") {
    import spark.implicits._
    // the documented SQL-WHERE semantics: NOT(null) = null → filtered.
    // 'a' wins with a NULL type (deleted), 'b' with a real non-error
    // type (kept); a null-safe predicate keeps 'a'
    val df = Seq(
      ("a", 1L, Some("ok")), ("a", 2L, Option.empty[String]),
      ("b", 1L, Option.empty[String]), ("b", 2L, Some("ok"))
    ).toDF("key", "seq", "event_type")
    val strict = Cdc.applyChangelog(df, Seq("key"), Seq("seq"),
      col("event_type") === "error")
      .select("key").as[String].collect().toSet
    assert(strict == Set("b"), s"null tombstone must delete: $strict")
    val nullSafe = Cdc.applyChangelog(df, Seq("key"), Seq("seq"),
      coalesce(col("event_type") === "error", lit(false)))
      .select("key").as[String].collect().toSet
    assert(nullSafe == Set("a", "b"), s"null-safe predicate must keep: $nullSafe")
  }

  test("scd2History: versions chain contiguously, ties break on the tie column") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val changes = Seq(
      ("k1", ts("2024-01-01 10:00:00"), 1L, "v1"),
      ("k1", ts("2024-01-01 11:00:00"), 3L, "v2"),
      // microsecond-identical pair: event id 4 then 5 orders the chain
      ("k1", ts("2024-01-01 11:00:00"), 5L, "v4"),
      ("k1", ts("2024-01-01 11:00:00"), 4L, "v3"),
      ("k2", ts("2024-01-01 09:00:00"), 2L, "w1")
    ).toDF("key", "ts", "eid", "payload")
    val hist = Cdc.scd2History(changes, Seq("key"), "ts", "eid")
      .orderBy("key", "valid_from_us", "eid")
      .select("key", "payload", "valid_from_us", "valid_to_us", "is_current")
      .as[(String, String, Long, Option[Long], Boolean)].collect().toSeq
    // every non-current version's valid_to equals the NEXT valid_from
    hist.groupBy(_._1).foreach { case (_, vs) =>
      vs.sliding(2).foreach {
        case Seq(a, b) => assert(a._4.contains(b._3),
          s"chain must be contiguous: $a -> $b")
        case _ =>
      }
      assert(vs.count(_._5) == 1, s"exactly one current version: $vs")
      assert(vs.last._5 && vs.last._4.isEmpty, s"open tail: $vs")
    }
    // the tied trio ordered v2 (eid 3) -> v3 (eid 4) -> v4 (eid 5)
    assert(hist.filter(_._1 == "k1").map(_._2) == Seq("v1", "v2", "v3", "v4"))
  }
}
