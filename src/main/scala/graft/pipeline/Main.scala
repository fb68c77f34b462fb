package graft.pipeline

import org.apache.spark.sql.SparkSession

/** CLI entry with reference-parity flags (main.go:11-40):
  *
  *   runMain graft.pipeline.Main --from=FILE --to=FILE \
  *     --env=FILE__SOURCE_URI=/in.json --env=JQ__QUERY='select(.age > 30)' \
  *     --env=FILE__DESTINATION_URI=/out.json [--dry-run]
  *
  * Env-style config also falls through to real environment variables,
  * like the reference (flags win).
  */
object Main {
  def main(args: Array[String]): Unit = {
    var from = ""
    val to = scala.collection.mutable.ArrayBuffer.empty[String]
    val env = scala.collection.mutable.Map.empty[String, String]
    var dryRun = false
    args.foreach {
      case a if a.startsWith("--from=") => from = a.stripPrefix("--from=")
      case a if a.startsWith("--to=") => to += a.stripPrefix("--to=")
      case a if a.startsWith("--env=") =>
        val kv = a.stripPrefix("--env=")
        val i = kv.indexOf('=')
        require(i > 0, s"bad --env: $kv")
        env += kv.take(i) -> kv.drop(i + 1)
      case "--dry-run" => dryRun = true
      case "--no-pipeline" => // direct transfer: same plan, no cache
      case other => sys.error(s"unknown flag: $other")
    }
    require(from.nonEmpty, "--from required")
    require(to.nonEmpty, "--to required")

    val envFall = sys.env.filter { case (k, _) => k.contains("__") }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-any2any")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    try {
      val res = Pipeline.run(spark,
        Pipeline.Spec(from, to.toSeq, envFall ++ env, dryRun))
      res.plans.foreach(println)
      res.sinkOutputs.foreach { case (s, outs) =>
        System.err.println(s"[graft] sink $s → ${outs.mkString(", ")}")
      }
    } finally spark.stop()
  }
}
