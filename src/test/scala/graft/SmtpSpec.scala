package graft

import java.nio.file.Files

import graft.sinks.Smtp

object FakeMailer {
  val sent = new java.util.concurrent.ConcurrentLinkedQueue[Smtp.Email]
  class Mailer extends Smtp.Mailer {
    def send(email: Smtp.Email): Unit = { FakeMailer.sent.add(email); () }
  }
}

class SmtpSpec extends SparkSuite {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_smtp").toString

  test("2-group frame: one email per compiled header set, MIME tree with base64 attachment") {
    FakeMailer.sent.clear()
    val dir = tmp()
    val df = Seq((1L, "alpha"), (2L, "alpha"), (3L, "beta"))
      .toDF("id", "team")
    val emails = Smtp.write(df, Smtp.Config(
      from = "noreply@corp.com",
      to = "to:[[ .team ]]@corp.com;cc:lead@corp.com",
      subject = "Report for [[ .team ]]",
      bodyTemplate = "<p>Attached.</p>",
      attachmentFilename = "data_[[ .team ]].csv",
      storageDir = dir), new FakeMailer.Mailer)

    assert(emails.size == 2)
    assert(FakeMailer.sent.size == 2)
    val alpha = emails.find(_.to == Seq("alpha@corp.com")).get
    assert(alpha.cc == Seq("lead@corp.com"))
    assert(alpha.subject == "Report for alpha")
    assert(alpha.attachments.map(_._1) == Seq("data_alpha.csv"))
    val csv = new String(alpha.attachments.head._2, "UTF-8")
    assert(csv.startsWith("id,team\n"))
    assert(csv.contains("1,alpha") && csv.contains("2,alpha") && !csv.contains("beta"))

    // MIME tree (client.go:82-103 shape)
    val mime = Smtp.buildMime(alpha)
    assert(mime.contains("From: noreply@corp.com\r\n"))
    assert(mime.contains("To: alpha@corp.com\r\n"))
    assert(mime.contains("Cc: lead@corp.com\r\n"))
    assert(mime.contains("Subject: Report for alpha\r\n"))
    assert(mime.contains("Content-Type: multipart/mixed; boundary="))
    assert(mime.contains("Content-Type: text/html; charset=UTF-8\r\n\r\n<p>Attached.</p>"))
    assert(mime.contains("Content-Disposition: attachment; filename=\"data_alpha.csv\"\r\n"))
    // base64 part round-trips to the CSV bytes
    val b64 = mime.split("Content-Transfer-Encoding: base64\r\n\r\n")(1)
      .split("\r\n--")(0)
    assert(new String(java.util.Base64.getMimeDecoder.decode(b64), "UTF-8") == csv)
    // Bcc never appears in headers
    assert(!mime.contains("Bcc:"))
  }

  test("link storage mode expands [[ range .Attachments ]] into the body (util.go:97-134)") {
    FakeMailer.sent.clear()
    val dir = tmp()
    val df = Seq((1L, "x")).toDF("id", "v")
    val emails = Smtp.write(df, Smtp.Config(
      from = "noreply@corp.com",
      to = "to:dev@corp.com",
      subject = "links",
      bodyTemplate = "<p>Files:</p><ul>[[ range .Attachments ]]" +
        "<li><a href=\"[[ .URI ]]\">[[ .Filename ]]</a></li>[[ end ]]</ul>",
      attachmentFilename = "out.json",
      storageMode = "link",
      storageDir = dir,
      linkBase = Some("https://store.example.com/bucket")), new FakeMailer.Mailer)
    val e = emails.head
    assert(e.attachments.isEmpty) // links, not MIME parts
    assert(e.body.contains("<li><a href=\"https://store.example.com/bucket/"))
    assert(e.body.contains("/out.json\">out.json</a></li>"))
    assert(!e.body.contains("[[ range"))
  }

  test("group with no data records falls back to bodyNoRecord (sink.go:344-347)") {
    FakeMailer.sent.clear()
    val dir = tmp()
    // specialized metadata record: all non-meta columns null
    val df = Seq(("batch-7", null.asInstanceOf[java.lang.Long]))
      .toDF("__METADATA__batch", "id")
    val emails = Smtp.write(df, Smtp.Config(
      from = "noreply@corp.com",
      to = "to:dev@corp.com",
      subject = "empty",
      bodyTemplate = "<p>has [[ range .Attachments ]][[ .Filename ]][[ end ]]</p>",
      bodyNoRecord = "<p>No records today.</p>",
      attachmentFilename = "out.json",
      storageDir = dir), new FakeMailer.Mailer)
    assert(emails.size == 1)
    assert(emails.head.body == "<p>No records today.</p>")
    assert(emails.head.attachments.isEmpty)
  }

  test("per-record header template trips the maxGroups guard, not a driver OOM") {
    FakeMailer.sent.clear()
    val dir = tmp()
    val df = spark.range(50).selectExpr("id", "CAST(id AS STRING) AS user")
    val e = intercept[IllegalArgumentException] {
      Smtp.write(df, Smtp.Config(
        from = "noreply@corp.com",
        to = "to:[[ .user ]]@corp.com", // one group PER ROW
        subject = "s",
        bodyTemplate = "<p>b</p>",
        attachmentFilename = "a.csv",
        storageDir = dir), new FakeMailer.Mailer, maxGroups = 10)
    }
    assert(e.getMessage.contains("maxGroups"))
    assert(FakeMailer.sent.isEmpty)
  }

  test("TO config parsing + DSN parsing (sink.go:96-111, client.go:27-49)") {
    assert(Smtp.parseTo("to:a@x,b@y;cc:c@z;bcc:d@w") == ("a@x,b@y", "c@z", "d@w"))
    assert(Smtp.parseTo("to:a@x") == ("a@x", "", ""))
    intercept[IllegalArgumentException](Smtp.parseTo("cc:c@z"))
    assert(Smtp.parseDsn("smtp://user:pw@mail.corp.com:2525")
      == ("mail.corp.com", 2525, "user", "pw"))
    assert(Smtp.parseDsn("smtp://mail.corp.com") == ("mail.corp.com", 587, "", ""))
    intercept[IllegalArgumentException](Smtp.parseDsn("http://mail.corp.com"))
  }

  test("Pipeline registry SMTP case routes through the injected mailer") {
    FakeMailer.sent.clear()
    val dir = tmp()
    Seq((1L, "a")).toDF("id", "team").write.mode("overwrite").json(s"$dir/in.json")
    val res = graft.pipeline.Pipeline.run(spark, graft.pipeline.Pipeline.Spec(
      from = "FILE", to = Seq("SMTP"),
      env = Map(
        "FILE__SOURCE_URI" -> s"$dir/in.json",
        "SMTP__FROM" -> "noreply@corp.com",
        "SMTP__TO" -> "to:dev@corp.com",
        "SMTP__SUBJECT" -> "s",
        "SMTP__BODY" -> "<p>b</p>",
        "SMTP__ATTACHMENT_FILENAME" -> "a.json",
        "SMTP__STORAGE_DESTINATION_DIR" -> s"$dir/store"),
      clients = Map("SMTP" -> new FakeMailer.Mailer)))
    assert(res.sinkOutputs("SMTP") == Seq("smtp:dev@corp.com"))
    assert(FakeMailer.sent.size == 1)
  }
}
