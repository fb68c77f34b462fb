package graft

/** Local perf iteration helper: warm-run then time named
  * `SparkEntry.queries` at a given sf dir on local[32] —
  * `runMain graft.TimeQ <sfDir> <q1> [q2 ...]`. The per-round
  * number of record stays `graft.Bench`; this exists so a single
  * query's plan change can be timed without a full bench sweep.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    args.drop(1).foreach { q =>
      // warm-up once, then timed
      SparkEntry.queries(q)(spark, dir).collect()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).collect()
      println(f"$q%-30s ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
