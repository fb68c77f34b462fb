package graft

import org.apache.spark.sql.functions._
import graft.ops.JoinReduce

class JoinReduceSpec extends SparkSuite {
  import spark.implicits._

  test("bloomSemiJoin equals the plain semi join (long and string keys)") {
    val fact = (1L to 1000L).map(i => (i, i % 7)).toDF("k", "v")
    val dim = Seq(3L, 14L, 500L, 999L, 2000L).toDF("k")
    val got = JoinReduce.bloomSemiJoin(fact, "k", dim, "k")
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 14L, 500L, 999L), s"long keys: $got")
    val factS = (1 to 500).map(i => (s"key$i", i)).toDF("s", "v")
    val dimS = Seq("key7", "key300", "nope").toDF("s")
    val gotS = JoinReduce.bloomSemiJoin(factS, "s", dimS, "s")
      .orderBy("v").collect().map(_.getString(0)).toSeq
    assert(gotS == Seq("key7", "key300"), s"string keys: $gotS")
  }

  test("bloomSemiJoin: null keys drop, duplicate dim keys don't multiply") {
    val fact = Seq((Option(1L), "a"), (Option.empty[Long], "b"),
      (Option(2L), "c"), (Option(1L), "d")).toDF("k", "p")
    val dim = Seq(1L, 1L, 1L).toDF("k")
    val got = JoinReduce.bloomSemiJoin(fact, "k", dim, "k")
      .orderBy("p").collect().map(_.getString(1)).toSeq
    // semi join: each matching fact row once, nulls never match
    assert(got == Seq("a", "d"), s"got $got")
  }

  test("the bloom probe prunes inside the scan, before the join") {
    // a Range source (not a LocalRelation — Catalyst folds filters
    // over local relations at optimize time, hiding the probe)
    val fact = spark.range(1L, 5001L).toDF("k")
    val dim = Seq(1L, 2L, 3L).toDF("j")
    val out = JoinReduce.bloomSemiJoin(fact, "k", dim, "j")
    val plan = out.queryExecution.executedPlan.toString
    // the probe must sit in a Filter on the fact side of the join
    assert(plan.contains("graft_bloom_might_contain"),
      s"probe missing from plan:\n$plan")
    val probeIdx = plan.indexOf("graft_bloom_might_contain")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "probe filter must be below (after, in tree print order) the join " +
        s"node:\nprobe@$probeIdx join@$joinIdx\n$plan")
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("guards: oversized filter and bad fpp fail fast") {
    val fact = Seq(1L).toDF("k")
    val dim = (1L to 100000L).toDF("k")
    intercept[IllegalArgumentException] {
      JoinReduce.bloomSemiJoin(fact, "k", dim, "k", maxBits = 1024L)
    }
    intercept[IllegalArgumentException] {
      JoinReduce.bloomSemiJoin(fact, "k", dim, "k", fpp = 1.5)
    }
  }
}
