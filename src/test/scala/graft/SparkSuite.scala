package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one local SparkSession for the whole test JVM. */
object SparkSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(s)
    s
  }
}

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.spark
  val sfDir = "/root/testdata/sf0.001"

  /** AQE-final plan only — the printed executedPlan appends the
    * pre-adaptive "Initial Plan", which still shows un-reused
    * duplicate exchanges (shared by the PlanSpec/PipelineOpsSpec
    * plan pins).
    */
  protected def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  /** Pin: every hash exchange in the plan sits directly above an
    * aggregate — i.e. it carries partial rows, never the raw corpus.
    */
  protected def assertHashExchangesAboveAggregates(plan: String, ctx: String): Unit = {
    val lines = plan.linesIterator.toSeq
    // a ReusedExchange line NAMES its reused target ("ReusedExchange
    // [...], Exchange hashpartitioning(...)") but performs no shuffle
    // ...and the prefix device's ONE deliberate corpus repartition on
    // its deterministic __bkt column is the exception by design (it is
    // counted separately by assertOneCorpusShuffle)
    lines.zipWithIndex.filter { case (l, _) =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange") &&
        !(l.contains("__bkt") && l.contains("REPARTITION_BY_NUM"))
    }.foreach {
      case (_, i) =>
        assert(i + 1 < lines.size && lines(i + 1).contains("HashAggregate"),
          s"$ctx: hash exchange not directly above an aggregate (line $i):\n$plan")
    }
  }
}
