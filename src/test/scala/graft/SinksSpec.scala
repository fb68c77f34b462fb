package graft

import java.nio.file.{Files, Paths}
import java.util.zip.ZipFile

import graft.sinks.{Archive, PartitionSinks, Xlsx}
import graft.sources.FetchSource
import graft.util.Retry

/** Collected-on-driver fake transport for testing distributed sinks:
  * executors append to a static buffer (works in local mode where
  * executors share the JVM).
  */
object FakeTransport {
  val sent = new java.util.concurrent.ConcurrentLinkedQueue[(String, Seq[String])]
  class Factory extends PartitionSinks.ClientFactory {
    def create(): PartitionSinks.BatchClient = new PartitionSinks.BatchClient {
      def send(group: String, batch: Seq[String]): Unit =
        FakeTransport.sent.add((group, batch))
    }
  }
}

class SinksSpec extends SparkSuite {
  import spark.implicits._

  test("grouped sink batches per compiled group template (K9 HTTP shape)") {
    FakeTransport.sent.clear()
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("ep", "v")
    PartitionSinks.writeGrouped(df,
      "https://host/[[ .ep ]]", new FakeTransport.Factory, batchSize = 10)
    val byGroup = FakeTransport.sent.toArray.toSeq
      .map(_.asInstanceOf[(String, Seq[String])])
      .groupBy(_._1).view.mapValues(_.flatMap(_._2)).toMap
    assert(byGroup.keySet == Set("https://host/a", "https://host/b"))
    assert(byGroup("https://host/a").size == 2)
    assert(byGroup("https://host/b").head.contains("\"v\":3"))
  }

  test("key-value sink emits templated key/value pairs (K8 Redis shape)") {
    FakeTransport.sent.clear()
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "payload")
    PartitionSinks.writeKeyValue(df, "k:[[ .id ]]", None,
      new FakeTransport.Factory, batchSize = 10)
    val flat = FakeTransport.sent.toArray.toSeq
      .map(_.asInstanceOf[(String, Seq[String])]).flatMap(_._2)
    assert(flat.size == 4) // 2 × (key, value)
    assert(flat.contains("k:1"))
    assert(flat.exists(_.contains("\"payload\":\"y\"")))
  }

  test("AES-zip: AE-2 structure, round-trip decrypt, wrong password rejected (file_archiver.go:195-205)") {
    import graft.sinks.AesZip
    val dir = Files.createTempDirectory("graft_aeszip")
    val f1 = Paths.get(s"$dir/a.txt"); Files.write(f1, "hello aes".getBytes)
    val f2 = Paths.get(s"$dir/sub/b.json")
    Files.createDirectories(f2.getParent)
    Files.write(f2, """{"k":1}""".getBytes)
    val dest = s"$dir/out.zip"
    Archive.archive(Seq(f1.toString, f2.toString), dest, password = Some("s3cret"))

    val bytes = Files.readAllBytes(Paths.get(dest))
    // zip magic + AES method 99 + 0x9901 extra field present
    assert(bytes(0) == 'P' && bytes(1) == 'K' && bytes(2) == 3 && bytes(3) == 4)
    val hex = bytes.map("%02x".format(_)).mkString
    assert(hex.contains("63000000")) // method 99 LE + dos time 0
    assert(hex.contains("01990700")) // extra 0x9901, size 7
    // java's standard reader refuses the entry: encryption flag is real
    val zf = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    intercept[java.util.zip.ZipException](zf.getNextEntry)

    val back = AesZip.readAll(bytes, "s3cret")
    assert(back.keySet == Set("a.txt", "sub/b.json"))
    assert(new String(back("a.txt"), "UTF-8") == "hello aes")
    assert(new String(back("sub/b.json"), "UTF-8") == """{"k":1}""")
    val e = intercept[IllegalArgumentException](AesZip.readAll(bytes, "wrong"))
    assert(e.getMessage.contains("wrong password"))
  }

  test("AES-zip handles large multi-block payloads (CTR counter advance)") {
    import graft.sinks.AesZip
    val dir = Files.createTempDirectory("graft_aeszip2")
    val data = Array.tabulate[Byte](100000)(i => (i * 31 % 251).toByte)
    val dest = s"$dir/big.zip"
    AesZip.write(dest, Seq("big.bin" -> data), "pw")
    val back = AesZip.readAll(Files.readAllBytes(Paths.get(dest)), "pw")
    assert(java.util.Arrays.equals(back("big.bin"), data))
  }

  test("AES-zip edge entries: empty payload and UTF-8 entry name") {
    import graft.sinks.AesZip
    val dir = Files.createTempDirectory("graft_aeszip3")
    val dest = s"$dir/edge.zip"
    AesZip.write(dest, Seq(
      "empty.txt" -> Array.emptyByteArray,
      "résumé.txt" -> "unicode name".getBytes("UTF-8")), "pw")
    val bytes = Files.readAllBytes(Paths.get(dest))
    val back = AesZip.readAll(bytes, "pw")
    assert(back("empty.txt").isEmpty)
    assert(new String(back("résumé.txt"), "UTF-8") == "unicode name")
    // the UTF-8 entry carries the EFS flag (0x0800 | encrypted 0x0001)
    val hex = bytes.map("%02x".format(_)).mkString
    assert(hex.contains("33000108")) // version 51 LE + flags 0x0801 LE
  }

  test("xlsx writer produces a readable OOXML package (D21)") {
    val dir = Files.createTempDirectory("graft_xlsx")
    val path = s"$dir/out.xlsx"
    val df = Seq((1L, "alice"), (2L, "b<b>&c")).toDF("id", "name")
    Xlsx.writeDataFrame(df.orderBy("id"), path)
    val zf = new ZipFile(path)
    try {
      val names = zf.stream().map[String](_.getName).toArray.toSeq.map(String.valueOf(_))
      assert(names.contains("xl/worksheets/sheet1.xml"))
      assert(names.contains("[Content_Types].xml"))
      val sheet = new String(
        zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes())
      assert(sheet.contains("<t>alice</t>"))
      assert(sheet.contains("&lt;b&gt;&amp;c")) // escaping
      assert(sheet.contains("""<row r="3">"""))
    } finally zf.close()
  }

  test("archive: zip and tar.gz with nearest-common-parent naming (D22)") {
    val dir = Files.createTempDirectory("graft_arch")
    val f1 = Files.writeString(dir.resolve("a.json"), "{\"x\":1}\n")
    val sub = Files.createDirectory(dir.resolve("sub"))
    val f2 = Files.writeString(sub.resolve("b.json"), "{\"x\":2}\n")
    val zipPath = s"$dir/out.zip"
    Archive.archive(Seq(f1.toString, f2.toString), zipPath)
    val zf = new ZipFile(zipPath)
    try {
      val names = zf.stream().map[String](_.getName).toArray.toSeq
        .map(String.valueOf(_)).sorted
      assert(names == Seq("a.json", "sub/b.json"))
    } finally zf.close()
    val tgz = s"$dir/out.tar.gz"
    Archive.archive(Seq(f1.toString, f2.toString), tgz)
    assert(Files.size(Paths.get(tgz)) > 0)
    assert(Archive.kindOf("x.tgz") == Archive.TarGz)
    assert(Archive.kindOf("x.zip") == Archive.Zip)
    assert(Archive.kindOf("x.json") == Archive.Gz)
  }

  test("fetch source paginates through driver-side pages (S5-S8 shape)") {
    val fetcher = new FetchSource.PageFetcher {
      def fetch(tok: Option[String]) = tok match {
        case None => (Seq("""{"id":1}""", """{"id":2}"""), Some("p2"))
        case Some("p2") => (Seq("""{"id":3}"""), None)
        case _ => fail("unexpected token")
      }
    }
    val df = FetchSource.read(spark, fetcher)
    assert(df.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("retry backs off and eventually succeeds / rethrows") {
    var calls = 0
    val v = Retry(maxAttempts = 3, backoffMs = 1) {
      calls += 1
      if (calls < 3) sys.error("boom") else 42
    }
    assert(v == 42 && calls == 3)
    var calls2 = 0
    intercept[RuntimeException] {
      Retry(maxAttempts = 2, backoffMs = 1) { calls2 += 1; sys.error("always") }
    }
    assert(calls2 == 2)
  }
}
