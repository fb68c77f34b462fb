package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug helper (r18): print the EXECUTED final adaptive plan of a
  * named query — what PlanSpec's finalPlan pin sees.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.registerAll(spark)
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    df.collect()
    println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    spark.stop()
  }
}
