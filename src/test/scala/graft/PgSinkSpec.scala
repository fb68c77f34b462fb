package graft

import java.nio.file.Files

import graft.pipeline.Pipeline
import graft.sinks.PgSink
import graft.util.Net

/** Offline fake of the PG transport: static buffers shared with
  * executor threads (local mode, one JVM).
  */
object FakePg {
  val copies = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]
  val execs = new java.util.concurrent.ConcurrentLinkedQueue[String]
  val connChecks = new java.util.concurrent.atomic.AtomicInteger
  @volatile var cols: Seq[String] = Nil

  def reset(tableCols: Seq[String]): Unit = {
    copies.clear(); execs.clear(); connChecks.set(0); cols = tableCols
  }

  class Factory extends PgSink.PgClientFactory {
    def create(): PgSink.PgClient = new PgSink.PgClient {
      override def exec(sql: String): Unit = { FakePg.execs.add(sql); () }
      def tableColumns(table: String): Seq[String] = FakePg.cols
      def copy(copySql: String, csvPayload: String): Long = {
        FakePg.copies.add((copySql, csvPayload))
        csvPayload.linesIterator.size - 1L
      }
      override def connCheck(): Unit = { FakePg.connChecks.incrementAndGet(); () }
    }
  }
}

class PgSinkSpec extends SparkSuite {
  import spark.implicits._

  test("COPY batches of batchSize records, each with CSV header (sink.go:103-122,175)") {
    FakePg.reset(Seq("id", "name", "score"))
    val df = Seq((1L, "a", 0.5), (2L, "b", 1.5), (3L, "c", 2.5), (4L, "d", 3.5), (5L, "e", 4.5))
      .toDF("id", "name", "score").coalesce(1)
    PgSink.write(df, PgSink.Spec("public.t", preSql = Some("TRUNCATE public.t"), batchSize = 2),
      new FakePg.Factory)
    assert(FakePg.execs.toArray.toSeq == Seq("TRUNCATE public.t"))
    val copies = FakePg.copies.toArray.toSeq.map(_.asInstanceOf[(String, String)])
    assert(copies.size == 3) // 2 + 2 + 1
    assert(copies.forall(_._1 ==
      "COPY public.t(id,name,score) FROM STDIN DELIMITER ',' CSV HEADER;"))
    assert(copies.forall(_._2.startsWith("id,name,score\n")))
    val allRows = copies.flatMap(_._2.linesIterator.drop(1).toSeq).sorted
    assert(allRows == Seq("1,a,0.5", "2,b,1.5", "3,c,2.5", "4,d,3.5", "5,e,4.5"))
  }

  test("header fields validate case-insensitively; unknown field fails (util.go:15-36)") {
    FakePg.reset(Seq("ID", "NAME"))
    val ok = Seq((1L, "a")).toDF("id", "name")
    PgSink.write(ok, PgSink.Spec("t"), new FakePg.Factory) // no error
    FakePg.reset(Seq("id"))
    val bad = Seq((1L, "a")).toDF("id", "rogue")
    val e = intercept[RuntimeException] {
      PgSink.write(bad, PgSink.Spec("t"), new FakePg.Factory)
    }
    assert(e.getMessage.contains("'rogue' does not match any column"))
  }

  test("CSV quoting: commas/quotes/newlines quoted, null is unquoted empty") {
    FakePg.reset(Seq("id", "v"))
    val df = Seq((1L, "plain"), (2L, "a,b"), (3L, "say \"hi\""), (4L, null))
      .toDF("id", "v").coalesce(1)
    PgSink.write(df, PgSink.Spec("t"), new FakePg.Factory)
    val rows = FakePg.copies.toArray.toSeq.map(_.asInstanceOf[(String, String)])
      .flatMap(_._2.linesIterator.drop(1).toSeq).sorted
    assert(rows == Seq("1,plain", "2,\"a,b\"", "3,\"say \"\"hi\"\"\"", "4,"))
  }

  test("dry-run skips COPY and probes connectivity (sink.go:184-189)") {
    FakePg.reset(Seq("id"))
    val df = Seq(Tuple1(1L)).toDF("id")
    PgSink.write(df, PgSink.Spec("t", dryRun = true), new FakePg.Factory)
    assert(FakePg.copies.isEmpty)
    assert(FakePg.connChecks.get == 1)
  }

  test("Pipeline registry routes --to=PSQL through the transport (K7 wiring)") {
    FakePg.reset(Seq("id", "name"))
    val dir = Files.createTempDirectory("graft_pg")
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("overwrite").json(s"$dir/in.json")
    val res = Pipeline.run(spark, Pipeline.Spec(
      from = "FILE", to = Seq("PSQL"),
      env = Map(
        "FILE__SOURCE_URI" -> s"$dir/in.json",
        "PSQL__DESTINATION_TABLE_ID" -> "public.dest",
        "PSQL__BATCH_SIZE" -> "512"),
      clients = Map("PSQL" -> new FakePg.Factory)))
    assert(res.sinkOutputs("PSQL") == Seq("public.dest"))
    val rows = FakePg.copies.toArray.toSeq.map(_.asInstanceOf[(String, String)])
      .flatMap(_._2.linesIterator.drop(1).toSeq)
    assert(rows.size == 2)
  }

  test("Pipeline dry-run reports per-sink conn checks (D15 + check.go)") {
    FakePg.reset(Seq("id"))
    val dir = Files.createTempDirectory("graft_pg_dry")
    Seq(Tuple1(1L)).toDF("id").write.mode("overwrite").json(s"$dir/in.json")
    val res = Pipeline.run(spark, Pipeline.Spec(
      from = "FILE", to = Seq("PSQL"), dryRun = true,
      env = Map(
        "FILE__SOURCE_URI" -> s"$dir/in.json",
        "PSQL__DESTINATION_TABLE_ID" -> "public.dest"),
      clients = Map("PSQL" -> new FakePg.Factory)))
    assert(res.connChecks == Map("PSQL" -> "ok"))
    assert(res.plans.nonEmpty && FakePg.copies.isEmpty)
  }
}

class NetSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("hostPort parses URLs with scheme-default ports (check.go:21-33)") {
    assert(Net.hostPort("http://example.com/x") == ("example.com", 80))
    assert(Net.hostPort("https://example.com") == ("example.com", 443))
    assert(Net.hostPort("http://example.com:8080/p") == ("example.com", 8080))
    assert(Net.hostPort("db.host:5432") == ("db.host", 5432))
    val e = intercept[RuntimeException](Net.hostPort("ftp://example.com"))
    assert(e.getMessage.contains("unsupported scheme"))
  }

  test("connCheck dials a live port and fails a closed one (check.go:43-47)") {
    val srv = new java.net.ServerSocket(0)
    try Net.connCheck(s"127.0.0.1:${srv.getLocalPort}", timeoutMs = 2000)
    finally srv.close()
    intercept[Exception](Net.connCheck(s"127.0.0.1:${srv.getLocalPort}", timeoutMs = 500))
  }
}
