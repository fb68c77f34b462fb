package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.pipeline.{Pipeline, TableSink}
import graft.sinks.FileSink

/** End-to-end pipeline: the reference README flagship
  * FILE → jq select → FILE, plus multi-sink, grouped destinations,
  * CSV conversion and the table sink (K2 APPEND/REPLACE).
  */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_pipe").toString

  private def writeInput(dir: String): String = {
    // FIXTURES.md A1
    val in = s"$dir/in.json"
    Files.write(Paths.get(in), Seq(
      """{"id": 1, "name": "alice", "age": 34, "active": true}""",
      """{"id": 2, "name": "bob",   "age": 28, "active": false}""",
      """{"id": 3, "name": "carol", "age": 41, "active": true}""").asJava)
    in
  }

  test("flagship: FILE → jq select(.age > 30) → FILE (README Advanced Usage)") {
    val dir = tmp()
    val in = writeInput(dir)
    val res = Pipeline.run(spark, Pipeline.Spec(
      from = "FILE", to = Seq("FILE"),
      env = Map(
        "FILE__SOURCE_URI" -> in,
        "JQ__QUERY" -> "select(.age > 30)",
        "FILE__DESTINATION_URI" -> s"$dir/out")))
    assert(res.sinkOutputs("FILE") == Seq(s"$dir/out"))
    val out = spark.read.json(s"$dir/out")
    assert(out.count() == 2)
    assert(out.select("name").as[String].collect().toSet == Set("alice", "carol"))
    // filename metadata was attached by the source and stripped by the sink
    assert(!out.columns.exists(_.startsWith("__METADATA__")))
  }

  test("multi-sink fan-out materializes once and writes to all (D5)") {
    val dir = tmp()
    val in = writeInput(dir)
    val res = Pipeline.run(spark, Pipeline.Spec(
      from = "FILE", to = Seq("FILE", "IO"),
      env = Map(
        "FILE__SOURCE_URI" -> in,
        "FILE__DESTINATION_URI" -> s"$dir/out")))
    assert(res.rows.contains(3L))
    assert(spark.read.json(s"$dir/out").count() == 3)
  }

  test("templated destination groups records (RFC 007 / D17)") {
    val dir = tmp()
    val df = Seq(("group_1", "v1"), ("group_1", "v3"), ("group_2", "v5"))
      .toDF("__METADATA__group_id", "column_1")
    val outs = FileSink.write(df, FileSink.Spec(
      destinationUri = s"$dir/file_[[ .__METADATA__group_id ]].json",
      stripMetadata = false))
    assert(outs == Seq(s"$dir/file_group_1.json", s"$dir/file_group_2.json"))
    // exact filenames exist, NDJSON content, grouped correctly
    val g1 = spark.read.json(s"$dir/file_group_1.json")
    assert(g1.count() == 2)
    val g2 = spark.read.json(s"$dir/file_group_2.json")
    assert(g2.select("column_1").as[String].collect().toSeq == Seq("v5"))
  }

  test("templated CSV keeps ONE header even when a group spans part files") {
    val dir = tmp()
    val df = (1 to 50).map(i => (s"g${i % 2}", s"v$i")).toDF("g", "column_1")
    val outs = FileSink.write(df, FileSink.Spec(
      destinationUri = s"$dir/out_[[ .g ]].csv",
      header = true,
      maxRecordsPerFile = 5, // forces >1 part file per group
      stripMetadata = false))
    assert(outs.size == 2)
    outs.foreach { f =>
      val lines = scala.io.Source.fromFile(f).getLines().toSeq
      assert(lines.count(_ == "g,column_1") == 1, s"$f: ${lines.take(3)}")
      assert(lines.head == "g,column_1", f)
      assert(lines.size == 26, f) // 1 header + 25 rows
    }
  }

  test("CSV sink inlines nested values as JSON strings (D19)") {
    val dir = tmp()
    val df = Seq((1L, Seq("a", "b"), ("x", 2L)))
      .toDF("id", "arr", "obj")
    FileSink.write(df, FileSink.Spec(destinationUri = s"$dir/out.csv"))
    val lines = spark.read.option("header", "true").csv(s"$dir/out.csv")
    assert(lines.columns.toSeq == Seq("id", "arr", "obj"))
    val row = lines.head()
    assert(row.getString(1) == """["a","b"]""")
    assert(row.getString(2).contains("\"x\""))
  }

  test("dry-run returns the plan without side effects (D15)") {
    val dir = tmp()
    val in = writeInput(dir)
    val res = Pipeline.run(spark, Pipeline.Spec(
      from = "FILE", to = Seq("FILE"),
      env = Map(
        "FILE__SOURCE_URI" -> in,
        "FILE__DESTINATION_URI" -> s"$dir/out"),
      dryRun = true))
    assert(res.plans.nonEmpty)
    assert(res.plans.head.contains("Scan"))
    assert(!Files.exists(Paths.get(s"$dir/out")))
  }

  test("SQL source front door runs a multi-statement script (D23/§3.2)") {
    val res = Pipeline.run(spark, Pipeline.Spec(
      from = "SQL", to = Seq("IO"),
      env = Map("SQL__QUERY" ->
        """@base := SELECT explode(sequence(1, 4)) AS n;
          |SELECT n, n * n AS sq FROM base WHERE n > 2;""".stripMargin)))
    assert(res.sinkOutputs("IO") == Seq("stdout"))
  }

  test("table sink APPEND and REPLACE with schema-driven cast (K2)") {
    val wh = tmp()
    spark.sql("DROP TABLE IF EXISTS graft_t1")
    Seq((1L, "a")).toDF("id", "name").write.saveAsTable("graft_t1")
    // append with case-insensitive column match + cast (int → bigint)
    TableSink.write(Seq((2, "b")).toDF("ID", "NAME"), "graft_t1", "APPEND")
    assert(spark.table("graft_t1").count() == 2)
    // replace overwrites
    TableSink.write(Seq((9L, "z")).toDF("id", "name"), "graft_t1", "REPLACE")
    val rows = spark.table("graft_t1").as[(Long, String)].collect().toSeq
    assert(rows == Seq((9L, "z")))
    // missing column → null
    TableSink.write(Seq(10L).toDF("id"), "graft_t1", "APPEND")
    assert(spark.table("graft_t1").where("name IS NULL").count() == 1)
    spark.sql("DROP TABLE graft_t1")
  }

  test("record index stamping via env (D8 batching metadata)") {
    val dir = tmp()
    val in = writeInput(dir)
    val df = Pipeline.transform(
      Pipeline.source(spark, Pipeline.Spec("FILE", Nil,
        Map("FILE__SOURCE_URI" -> in))),
      Pipeline.Spec("FILE", Nil, Map(
        "GRAFT__RECORD_INDEX" -> "true",
        "GRAFT__CONNECTOR_BATCH_SIZE" -> "2")))
    import graft.model.Meta
    val idx = df.select(Meta.RecordIndexCol, Meta.BatchIndexCol)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(idx == Seq((0L, 0L), (1L, 0L), (2L, 1L)))
  }
}
