package graft

import java.sql.Timestamp
import graft.ops.AsOf

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks the latest right row at or before each left ts") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:30")),
      (3L, "B", ts("2024-01-01 10:00:10")),
      (4L, "A", ts("2024-01-01 09:59:00")) // before any quote
    ).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:20"), 101.0),
      ("B", ts("2024-01-01 10:00:10"), 50.0) // equal ts → matches (<=)
    ).toDF("sym", "ts", "price")
    val out = AsOf.asofJoin(trades, quotes, "sym", "ts", Seq("price"))
      .select("trade_id", "asof_price")
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(100.0)) // latest quote ≤ 10:00:05
    assert(out(2L).contains(101.0)) // newer quote picked
    assert(out(3L).contains(50.0))  // equal timestamp matches
    assert(out(4L).isEmpty)         // no prior quote → null
  }

  test("left columns survive untouched and row count is preserved") {
    val l = Seq((1L, "A", ts("2024-01-01 00:00:01"), "x"))
      .toDF("id", "k", "ts", "payload")
    val r = Seq(("A", ts("2024-01-01 00:00:00"), 9L)).toDF("k", "ts", "v")
    val out = AsOf.asofJoin(l, r, "k", "ts", Seq("v"))
    assert(out.columns.toSeq == Seq("id", "k", "ts", "payload", "asof_v"))
    assert(out.count() == 1)
    assert(out.head().getAs[Long]("asof_v") == 9L)
  }
}
