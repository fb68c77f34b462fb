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

  test("pre-query loop: pre-rows drive templated queries, merge + filename (source.go:135-247)") {
    import graft.pipeline.QueryLoop
    Seq(("us", 1L), ("eu", 2L)).toDF("geo", "gk").createOrReplaceTempView("geos")
    Seq((1L, 10L, "a"), (1L, 11L, "b"), (2L, 20L, "c"))
      .toDF("gk", "id", "v").createOrReplaceTempView("facts")
    val out = QueryLoop.run(spark, QueryLoop.Spec(
      preQuery = "SELECT geo, gk FROM geos",
      preQueryFilename = "pre.sql",
      queryFiles = Seq(
        "facts.sql" -> "SELECT id, v FROM facts WHERE gk = [[ .__METADATA__gk ]]")))
    val data = out.data.get
    // merged pre-row fields carried as metadata; record-side columns win
    assert(data.columns.toSet == Set("id", "v",
      "__METADATA__geo", "__METADATA__gk", "__METADATA__filename"))
    val rows = data
      .select("id", "__METADATA__geo", "__METADATA__filename")
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(rows == Seq((10L, "us", "facts.sql"), (11L, "us", "facts.sql"),
      (20L, "eu", "facts.sql")))
    // pre-rows emitted as specialized metadata records
    val pre = out.preRecords.get
    import graft.model.Meta
    assert(pre.filter(Meta.isSpecializedMetadataRecord(pre)).count() == 2)
    assert(pre.select("__METADATA__filename").distinct()
      .as[String].collect().toSeq == Seq("pre.sql"))
    // single-stream view carries both
    assert(out.merged.get.count() == 5)
  }

  test("pre-query loop: null pre-row values merge with the pre-query's types") {
    import graft.pipeline.QueryLoop
    Seq((1L, Option.empty[String]), (2L, Some("tag")))
      .toDF("gk", "note").createOrReplaceTempView("geos_nullable")
    Seq((1L, 10L), (2L, 20L)).toDF("gk", "id").createOrReplaceTempView("facts_n")
    val out = QueryLoop.run(spark, QueryLoop.Spec(
      preQuery = "SELECT gk, note FROM geos_nullable",
      queryFiles = Seq(
        "f.sql" -> "SELECT id FROM facts_n WHERE gk = [[ .__METADATA__gk ]]")))
    val data = out.data.get
    // merged column keeps the pre-query's STRING type even when the
    // first pre-row's value is null (a bare lit(null) would be NullType)
    assert(data.schema("__METADATA__note").dataType ==
      org.apache.spark.sql.types.StringType)
    val dir = tmp()
    data.write.mode("overwrite").parquet(s"$dir/loop_out") // must not throw
    assert(spark.read.parquet(s"$dir/loop_out").count() == 2)
  }

  test("pre-query loop: empty pre-query runs each file once (client_reader.go:76-79)") {
    import graft.pipeline.QueryLoop
    Seq((1L, "x")).toDF("id", "v").createOrReplaceTempView("solo")
    val out = QueryLoop.run(spark, QueryLoop.Spec(
      preQuery = "",
      queryFiles = Seq(
        "a.sql" -> "SELECT id FROM solo",
        "b.sql" -> "SELECT v FROM solo")))
    assert(out.compiled.map(_._1) == Seq("a.sql", "b.sql"))
    val got = out.data.get.select("__METADATA__filename", "id", "v")
      .collect().toSeq.map(r => (r.getString(0), r.isNullAt(1), r.isNullAt(2))).sorted
    assert(got == Seq(("a.sql", false, true), ("b.sql", true, false)))
  }

  test("pre-query loop via registry + dry-run compiled queries (S2 wiring)") {
    import graft.pipeline.QueryLoop
    val dir = tmp()
    Files.createDirectories(Paths.get(s"$dir/queries"))
    Files.write(Paths.get(s"$dir/queries/q1.sql"),
      "SELECT id FROM loop_src WHERE id > [[ .__METADATA__lo ]]".getBytes)
    Files.write(Paths.get(s"$dir/pre.sql"),
      "SELECT 1 AS lo".getBytes)
    Seq(1L, 2L, 3L).toDF("id").createOrReplaceTempView("loop_src")
    val res = Pipeline.run(spark, Pipeline.Spec(
      from = "MC", to = Seq("IO"),
      env = Map(
        "MC__QUERY_FILE_PATH" -> s"$dir/queries",
        "MC__PRE_QUERY_FILE_PATH" -> s"$dir/pre.sql")))
    assert(res.sinkOutputs("IO") == Seq("stdout"))
    // dry-run compiles but does not execute
    val dry = QueryLoop.run(spark, QueryLoop.Spec(
      preQuery = "SELECT 1 AS lo",
      queryFiles = QueryLoop.readQueryFiles(spark, s"$dir/queries")), dryRun = true)
    assert(dry.data.isEmpty)
    assert(dry.compiled ==
      Seq(("q1.sql", "SELECT id FROM loop_src WHERE id > <no value>")))
  }

  test("destination templates may reference metadata columns (constructFileURI shape)") {
    val dir = tmp()
    val df = Seq((1L, "x"), (2L, "y"))
      .toDF("id", "v")
      .withColumn("__METADATA__batch", org.apache.spark.sql.functions.lit("b7"))
    val outs = FileSink.write(df, FileSink.Spec(
      destinationUri = s"$dir/out_[[ .__METADATA__batch ]]_[[ .id ]].json"))
    assert(outs.sorted == Seq(s"$dir/out_b7_1.json", s"$dir/out_b7_2.json"))
    // metadata stays OUT of the payload even though the route used it
    val payload = new String(Files.readAllBytes(Paths.get(outs.head)), "UTF-8")
    assert(!payload.contains("__METADATA__"))
    assert(payload.contains("\"v\":\"x\""))
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

  test("pre-query loop: maxPreRows guard fails loud on data-scale pre-queries") {
    import graft.pipeline.QueryLoop
    val e = intercept[IllegalArgumentException] {
      QueryLoop.run(spark, QueryLoop.Spec(
        preQuery = "SELECT id FROM range(10)",
        queryFiles = Seq(("q.sql", "SELECT 1 AS one")),
        maxPreRows = 5))
    }
    assert(e.getMessage.contains("maxPreRows"))
    // at the limit it still runs: 10 pre-rows × 1 file
    val ok = QueryLoop.run(spark, QueryLoop.Spec(
      preQuery = "SELECT id FROM range(10)",
      queryFiles = Seq(("q.sql", "SELECT 1 AS one")),
      maxPreRows = 10))
    assert(ok.data.get.count() == 10)
  }

  test("S3 env auth maps onto fs.s3a.* session conf (K4, ext/s3/sink.go:39-51)") {
    val applied = graft.util.S3Conf(spark, Map(
      "S3__CREDENTIALS" ->
        """{"aws_access_key_id":"AKIAX","aws_secret_access_key":"sek","aws_session_token":"tok"}""",
      "S3__REGION" -> "ap-southeast-2"))
    assert(applied("fs.s3a.access.key") == "AKIAX")
    assert(applied("fs.s3a.secret.key") == "sek")
    assert(applied("fs.s3a.session.token") == "tok")
    assert(applied("fs.s3a.aws.credentials.provider")
      .contains("TemporaryAWSCredentialsProvider"))
    assert(applied("fs.s3a.endpoint.region") == "ap-southeast-2")
    val hconf = spark.sparkContext.hadoopConfiguration
    assert(hconf.get("fs.s3a.access.key") == "AKIAX")
    // flat keys win over the blob; no session token → no provider override
    val flat = graft.util.S3Conf(spark, Map(
      "S3__CREDENTIALS" -> """{"aws_access_key_id":"blob","aws_secret_access_key":"blob"}""",
      "S3__ACCESS_KEY_ID" -> "FLAT",
      "S3__SECRET_ACCESS_KEY" -> "flatsec",
      "S3__ENDPOINT" -> "http://localhost:9000",
      "S3__PATH_STYLE_ACCESS" -> "TRUE"))
    assert(flat("fs.s3a.access.key") == "FLAT")
    assert(!flat.contains("fs.s3a.aws.credentials.provider"))
    assert(flat("fs.s3a.endpoint") == "http://localhost:9000")
    assert(flat("fs.s3a.path.style.access") == "true")
    // vendor token provider is rejected loudly (tiktok_provider.go)
    val err = intercept[IllegalArgumentException] {
      graft.util.S3Conf(spark, Map("S3__PROVIDER" -> "tiktok"))
    }
    assert(err.getMessage.contains("S3__PROVIDER"))
    // malformed blob is an error, not silent defaults (util.go:19-22)
    intercept[IllegalArgumentException] {
      graft.util.S3Conf.parseCredentials("""{"aws_access_key_id":"only"}""")
    }
  }
}
