package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

class LayoutSpec extends SparkSuite {

  private def refMorton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference bit interleave; SQL text agrees with the Column form") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1023L),
      (512L, 1L), (7L, 896L))
    val df = pts.toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y"), 10))
      .withColumn("zsql", expr(Layout.zValueSql("x", "y", 10)))
    val rows = df.select("x", "y", "z", "zsql")
      .as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (x, y, z, zsql) =>
      assert(z == refMorton(x, y, 10), s"($x, $y): kernel $z ref ${refMorton(x, y, 10)}")
      assert(z == zsql, s"($x, $y): column $z sql $zsql")
    }
    // interleave ranges over exactly [0, 4^bits)
    assert(refMorton(1023L, 1023L, 10) == (1L << 20) - 1)
  }

  test("zorderRepartition range-partitions on the z-value and sorts within partitions") {
    import spark.implicits._
    val df = (0L until 4096L).map(i => (i % 64, i / 64)).toDF("x", "y")
    val laid = Layout.zorderRepartition(df, col("x"), col("y"), 6, 8)
    val plan = laid.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(__z"), plan)
    // each partition covers a contiguous, non-overlapping z range
    val ranges = laid.select(col("__z"))
      .mapPartitions(it => {
        val zs = it.map(_.getLong(0)).toSeq
        if (zs.isEmpty) Iterator.empty
        else Iterator.single((zs.min, zs.max, zs == zs.sorted))
      }).collect().sortBy(_._1)
    assert(ranges.forall(_._3), "z must be sorted within every partition")
    ranges.sliding(2).foreach {
      case Array((_, hi, _), (lo, _, _)) => assert(hi <= lo, s"overlap: $hi > $lo")
      case _ =>
    }
  }

  test("proportionalInterleave: mid-quantile schedule by hand; prefixes stay mixed") {
    import spark.implicits._
    import graft.ops.Layout
    // a has 4 rows (keys 1/8, 3/8, 5/8, 7/8), b has 2 (1/4, 3/4) →
    // order a b a a b a: no prefix clumps a source
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 10L), ("b", 11L)).toDF("src", "id")
    val out = Layout.proportionalInterleave(df, "src", Seq("id"))
      .orderBy("position")
      .select("src", "id", "position", "n_total")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq("a", "b", "a", "a", "b", "a"),
      s"schedule: $out")
    assert(out.map(_._3) == (1L to 6L) && out.forall(_._4 == 6L),
      s"positions: $out")
    // within a stratum the order respects orderCols (curriculum)
    assert(out.filter(_._1 == "a").map(_._2) == Seq(1L, 2L, 3L, 4L))
  }
}
