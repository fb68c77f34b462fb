package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement harness for the optimization rounds (guide §1): for
  * each named SparkEntry query, runs it once warm through the noop
  * sink and reports wall seconds, job/stage/task counts and shuffle
  * bytes from a SparkListener, then writes the `.explain("formatted")`
  * plan to plans/<tag>/<query>_<suffix>.txt. The bench of record stays
  * `graft.Bench`; this exists so a plan change's shape (Exchange
  * count, stage count, shuffled bytes) is a recorded fact, not a
  * guess.
  *
  *   runMain graft.tools.ProfileQ <sfDir> <planDir|-> <suffix> <q1> [q2 ...]
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val planDir = args(1)
    val suffix = args(2)
    val qs = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.registerAll(spark)

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufRead = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        shufRead.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    qs.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      // warm run (JIT + codegen), not measured
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      graft.ops.Robust.unpersistPersisted()
      jobs.set(0); stages.set(0); tasks.set(0)
      shufRead.set(0L); shufWrite.set(0L)
      spark.sparkContext.setJobDescription(q)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      graft.ops.Robust.unpersistPersisted()
      // listener events drain asynchronously; give them a beat
      Thread.sleep(300)
      println(f"$q%-32s ${dt}%7.2fs jobs=${jobs.get}%-3d stages=${stages.get}%-4d " +
        f"tasks=${tasks.get}%-5d shufR=${shufRead.get / 1024}%8dKB shufW=${shufWrite.get / 1024}%8dKB")
      if (planDir != "-") {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val dir = java.nio.file.Paths.get(planDir)
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(dir.resolve(s"${q}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        graft.ops.Robust.unpersistPersisted()
      }
    }
    spark.stop()
  }
}
