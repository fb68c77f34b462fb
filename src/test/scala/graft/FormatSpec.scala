package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.col

import graft.sinks.FileSink
import graft.sources.FileSource

/** Format-conversion semantics (reference D19/D20,
  * internal/ext/fileconverter/csv2json.go + json2csv.go, whose tests
  * are the only golden corpus the reference ships).
  */
class FormatSpec extends SparkSuite {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_fmt").toString

  test("CSV→JSON with header row (csv2json.go:56-68)") {
    val dir = tmp()
    Files.write(Paths.get(s"$dir/in.csv"),
      Seq("name,age", "alice,34", "bob,28").asJava)
    val df = FileSource.read(spark, s"$dir/in.csv", filenameColumn = None)
    assert(df.columns.toSeq == Seq("name", "age"))
    assert(df.count() == 2)
    // CSV fields arrive as strings (SURVEY §1.3: every CSV field is a string)
    assert(df.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.StringType))
  }

  test("headerless CSV gets positional \"0\",\"1\" names (csv2json.go:69-78)") {
    val dir = tmp()
    Files.write(Paths.get(s"$dir/in.csv"), Seq("alice,34", "bob,28").asJava)
    val df = FileSource.read(spark, s"$dir/in.csv",
      skipHeader = false, filenameColumn = None)
    assert(df.columns.toSeq == Seq("0", "1"))
    assert(df.count() == 2)
  }

  test("skipRows drops leading rows per file (csv2json.go:40-54)") {
    val dir = tmp()
    Files.write(Paths.get(s"$dir/in.csv"),
      Seq("garbage line 1", "name,age", "alice,34").asJava)
    val df = FileSource.read(spark, s"$dir/in.csv",
      skipHeader = false, skipRows = 2, filenameColumn = None)
    assert(df.count() == 1)
  }

  test("CRLF input is normalized (normalized_reader.go)") {
    val dir = tmp()
    Files.write(Paths.get(s"$dir/in.csv"),
      "name,age\r\nalice,34\r\nbob,28\r\n".getBytes)
    val df = FileSource.read(spark, s"$dir/in.csv", filenameColumn = None)
    assert(df.count() == 2)
    assert(df.select("age").as[String].collect().toSet == Set("34", "28"))
  }

  test("TSV dispatch by extension (fs/util.go:13 format list)") {
    val dir = tmp()
    Files.write(Paths.get(s"$dir/in.tsv"), Seq("a\tb", "1\t2").asJava)
    val df = FileSource.read(spark, s"$dir/in.tsv", filenameColumn = None)
    assert(df.columns.toSeq == Seq("a", "b"))
    assert(df.head().getString(0) == "1")
  }

  test("JSON→CSV round trip: union-of-keys header (json2csv.go:33-48)") {
    val dir = tmp()
    // heterogeneous records: header must be the union of keys
    Files.write(Paths.get(s"$dir/in.json"),
      Seq("""{"a": 1, "b": "x"}""", """{"a": 2, "c": true}""").asJava)
    val df = FileSource.read(spark, s"$dir/in.json", filenameColumn = None)
    assert(df.columns.toSet == Set("a", "b", "c")) // union schema
    FileSink.write(df, FileSink.Spec(s"$dir/out.csv"))
    val back = spark.read.option("header", "true").csv(s"$dir/out.csv")
    assert(back.columns.toSet == Set("a", "b", "c"))
    assert(back.count() == 2)
  }

  test("directory source concatenates files with filename metadata (S1)") {
    val dir = tmp()
    val sub = s"$dir/data"
    Files.createDirectories(Paths.get(sub))
    Files.write(Paths.get(s"$sub/one.json"), Seq("""{"v": 1}""").asJava)
    Files.write(Paths.get(s"$sub/two.json"), Seq("""{"v": 2}""").asJava)
    val df = FileSource.read(spark, sub)
    assert(df.count() == 2)
    val names = df.select(graft.model.Meta.FilenameCol).as[String].collect()
    assert(names.exists(_.endsWith("one.json")))
    assert(names.exists(_.endsWith("two.json")))
  }

  test("gzip compression option produces .gz parts readable back (D22 gz)") {
    val dir = tmp()
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    FileSink.write(df, FileSink.Spec(s"$dir/out",
      compression = Some("gzip")))
    val parts = Files.list(Paths.get(s"$dir/out")).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(parts.exists(_.endsWith(".json.gz")), parts.toString)
    assert(spark.read.json(s"$dir/out").count() == 2)
  }

  test("ORC round trip: sink by extension, source reads types back") {
    val dir = tmp()
    val df = Seq((1L, "x", 1.5), (2L, "y", -2.0)).toDF("id", "s", "v")
    FileSink.write(df, FileSink.Spec(s"$dir/out.orc"))
    val back = FileSource.read(spark, s"$dir/out.orc", filenameColumn = None)
      .orderBy("id")
    assert(back.schema.map(f => (f.name, f.dataType.simpleString)).toSeq ==
      Seq("id" -> "bigint", "s" -> "string", "v" -> "double"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq == Seq((1L, "x", 1.5), (2L, "y", -2.0)))
  }

  test("templated ORC destinations produce one valid file per group") {
    val dir = tmp()
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    val outs = FileSink.write(df,
      FileSink.Spec(s"$dir/out_[[ .g ]].orc"))
    assert(outs == Seq(s"$dir/out_a.orc", s"$dir/out_b.orc"))
    // each group file is a well-formed ORC file (single-part rename,
    // never stream-concatenated)
    assert(spark.read.orc(s"$dir/out_a.orc").count() == 2)
    assert(spark.read.orc(s"$dir/out_b.orc").count() == 1)
    // chunked binary groups are rejected up front
    val e = intercept[RuntimeException] {
      FileSink.write(df, FileSink.Spec(s"$dir/c_[[ .g ]].orc",
        maxRecordsPerFile = 1L))
    }
    assert(e.getMessage.contains("concatenate"))
  }

  test("lz4 compression round-trips (codec passthrough beyond gzip)") {
    val dir = tmp()
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    FileSink.write(df, FileSink.Spec(s"$dir/out",
      compression = Some("lz4")))
    val parts = Files.list(Paths.get(s"$dir/out")).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(parts.exists(_.endsWith(".json.lz4")), parts.toString)
    assert(spark.read.json(s"$dir/out").count() == 2)
  }

  test("malformed NDJSON lines survive as _corrupt_record, good rows parse (PERMISSIVE)") {
    val dir = tmp()
    Files.write(Paths.get(s"$dir/in.json"), Seq(
      """{"v": 1}""",
      """{"v": 2, "broken""",
      """not json at all""",
      """{"v": 3}""").asJava)
    // cache: Spark disallows querying ONLY _corrupt_record off a raw
    // JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val df = FileSource.read(spark, s"$dir/in.json", filenameColumn = None).cache()
    try {
      assert(df.count() == 4) // nothing silently dropped
      val good = df.filter(col("_corrupt_record").isNull)
        .select("v").as[Long].collect().sorted.toSeq
      assert(good == Seq(1L, 3L))
      assert(df.filter(col("_corrupt_record").isNotNull).count() == 2)
    } finally df.unpersist()
  }

  test("XML round trip via Spark 4's native xml datasource") {
    val dir = tmp()
    val df = Seq((1L, "alice"), (2L, "bob")).toDF("id", "name")
    FileSink.write(df, FileSink.Spec(s"$dir/out.xml"))
    val back = FileSource.read(spark, s"$dir/out.xml", filenameColumn = None)
      .orderBy("id")
    assert(back.columns.toSeq.sorted == Seq("id", "name"))
    assert(back.select("name").as[String].collect().toSeq == Seq("alice", "bob"))
  }
}
