package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.sources.Bucketing

class ScaleToolsSpec extends SparkSuite {
  import spark.implicits._

  test("saltedAgg equals plain aggregation (count + decimal sum)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val plain = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("c"),
        sum($"l_quantity".cast("decimal(18,2)")).as("s"))
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map(r => (r._1, r._2, r._3.doubleValue)).toSet
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), 16,
      partial = Seq(count(lit(1)).as("c"),
        sum($"l_quantity".cast("decimal(18,2)")).as("s")),
      merge = Seq(sum($"c").cast("long").as("c"), sum($"s").as("s")),
      saltSource = Seq($"l_orderkey", $"l_linenumber"))
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map(r => (r._1, r._2, r._3.doubleValue)).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .select($"p_partkey".as("l_partkey"), $"p_brand")
    val plain = li.join(part, "l_partkey").count()
    val salted = Skew.saltedJoin(li, part, "l_partkey", 8,
      bigSaltSource = Seq($"l_orderkey", $"l_partkey")).count()
    assert(salted == plain && plain > 0)
  }

  test("bucketed join plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS graft_b_orders")
    spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
    // a crashed run can leave the managed location without the catalog
    // entry; clear it so saveAsTable doesn't refuse
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    Seq("graft_b_orders", "graft_b_lineitem").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$wh/$t"))
    }
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(o, "graft_b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(l, "graft_b_lineitem", "o_orderkey", 8)
    // disable broadcast so the join exercises the bucketed distribution
    // (at real scale both sides are far over any broadcast threshold)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark,
        "graft_b_orders", "graft_b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE graft_b_orders")
    spark.sql("DROP TABLE graft_b_lineitem")
  }

  test("heavyHitterReport: exact head with shares and cumulative shares") {
    // key a ×5, b ×3, c ×2 → total 10
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val out = Skew.heavyHitterReport(df, "k", topK = 2)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(("a", 5L, 1L, 0.5, 0.5), ("b", 3L, 2L, 0.3, 0.8)),
      s"got $out")
    intercept[IllegalArgumentException] {
      Skew.heavyHitterReport(df, "k", topK = 0)
    }
  }
}
