package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String→timestamp parsing ladder (reference
  * ext/maxcompute/util.go:665-711): RFC3339, then the warehouse
  * timestamp/datetime/date forms, then the ISO non-standard variants
  * (util.go:22). Each rung is a `try_to_timestamp` (null on mismatch),
  * coalesced in ladder order — codegen'd, no UDF.
  */
object TimeParse {

  private val ladder = Seq(
    "yyyy-MM-dd'T'HH:mm:ssXXX", // RFC3339
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd HH:mm:ss.SSSSSS", // warehouse TimeStampFormat (fractional)
    "yyyy-MM-dd HH:mm:ss", // DateTimeFormat
    "yyyy-MM-dd", // DateFormat
    "yyyy-MM-dd'T'HH:mm:ss.SSSZ", // ISO non-standard "2006-01-02T15:04:05.000-0700"
    "yyyy-MM-dd HH:mm:ss zzz") // ISO non-standard "2006-01-02 15:04:05 MST"

  def parseTime(c: Column): Column =
    coalesce(ladder.map(f => try_to_timestamp(c, lit(f))) :+ try_to_timestamp(c): _*)
}
