package graft

import graft.sources.{Gmail, GoogleAnalytics, Salesforce}
import graft.util.OAuth2

class AdaptersSpec extends SparkSuite {

  // ---- Salesforce -----------------------------------------------------

  /** Canned 3-page SOQL result: 5 records, batch size 2 — replays the
    * NextRecordsURL rewrite contract (source.go:80-90).
    */
  class FakeSfClient extends Salesforce.Client {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    def query(soqlOrUrl: String, includeDeleted: Boolean): Salesforce.QueryResult = {
      calls += soqlOrUrl
      soqlOrUrl match {
        case q if q.startsWith("SELECT") =>
          Salesforce.QueryResult(5, done = false,
            "/services/data/v54.0/query/01gxx-2",
            Seq("""{"Id":"a","N":1}""", """{"Id":"b","N":2}"""))
        case "/services/data/v54.0/query/01gxx-2" =>
          Salesforce.QueryResult(5, done = false, "",
            Seq("""{"Id":"c","N":3}""", """{"Id":"d","N":4}"""))
        case "/services/data/v54.0/query/01gxx-4" =>
          Salesforce.QueryResult(5, done = true, "", Seq("""{"Id":"e","N":5}"""))
        case other => sys.error(s"unexpected url: $other")
      }
    }
  }

  test("salesforce pagination rewrites the NextRecordsURL batch suffix (source.go:80-106)") {
    val client = new FakeSfClient
    val df = Salesforce.read(spark, client, "SELECT Id FROM Lead")
    assert(df.count() == 5)
    assert(df.select("Id").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted.toSeq == Seq("a", "b", "c", "d", "e"))
    // initial query + offsets 2 and 4, template-derived
    assert(client.calls.toSeq == Seq("SELECT Id FROM Lead",
      "/services/data/v54.0/query/01gxx-2", "/services/data/v54.0/query/01gxx-4"))
  }

  test("salesforce single-page result fetches nothing further") {
    val client = new Salesforce.Client {
      var n = 0
      def query(q: String, d: Boolean): Salesforce.QueryResult = {
        n += 1
        Salesforce.QueryResult(2, done = true, "", Seq("""{"Id":"x"}""", """{"Id":"y"}"""))
      }
    }
    assert(Salesforce.read(spark, client, "SELECT Id FROM Lead").count() == 2)
  }

  // ---- Gmail ----------------------------------------------------------

  class FakeGmail extends Gmail.Service {
    private def b64(s: String) =
      java.util.Base64.getUrlEncoder.encodeToString(s.getBytes("UTF-8"))
    def listMessages(filter: String): Seq[String] = Seq("m1", "m2")
    def getMessage(id: String): Gmail.Message = id match {
      case "m1" => Gmail.Message("m1", Seq(
        Gmail.Part("report.csv", "att1"),
        Gmail.Part("", "ignored"))) // body part without filename skipped
      case "m2" => Gmail.Message("m2", Seq(Gmail.Part("extra.json", "att2")))
      case _ => sys.error("unknown message")
    }
    def getAttachment(messageId: String, attachmentId: String): String =
      attachmentId match {
        // CRLF endings + quoted field exercise the normalize+parse path
        case "att1" => b64("id,name\r\n1,\"alpha, inc\"\r\n2,beta\r\n")
        case "att2" => b64("""{"id":"9","name":"gamma"}""" + "\n")
        case _ => sys.error("unknown attachment")
      }
  }

  test("gmail attachments decode, csv converts to string records, filename stamped (source.go:93-158)") {
    val df = Gmail.read(spark, new FakeGmail, "from:reports@corp.com")
    assert(df.count() == 3)
    // csv values stay strings (csv2json contract)
    assert(df.schema("id").dataType == org.apache.spark.sql.types.StringType)
    val rows = df.select("id", "name", "__METADATA__filename")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(rows == Seq(
      ("1", "alpha, inc", "report.csv"),
      ("2", "beta", "report.csv"),
      ("9", "gamma", "extra.json")))
  }

  test("csv parse keeps all-empty-field rows, skips pure blank lines (csv2json parity)") {
    val lines = Gmail.csvToJsonLines("a,b\n1,2\n,\n\n3,4\n", ',')
    assert(lines == Seq(
      """{"a":"1","b":"2"}""",
      """{"a":"","b":""}""", // ",," row of empty fields survives
      """{"a":"3","b":"4"}"""))
  }

  test("gmail with no matching messages yields an empty frame (source.go:87-90)") {
    val svc = new Gmail.Service {
      def listMessages(f: String): Seq[String] = Nil
      def getMessage(id: String): Gmail.Message = sys.error("unreachable")
      def getAttachment(m: String, a: String): String = sys.error("unreachable")
    }
    assert(Gmail.read(spark, svc, "x").count() == 0)
  }

  // ---- Google Analytics ----------------------------------------------

  class FakeGa extends GoogleAnalytics.Client {
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Long]
    def runReport(propertyId: String, startDate: String, endDate: String,
        dimensions: Seq[String], metrics: Seq[String],
        limit: Long, offset: Long): GoogleAnalytics.Report = {
      offsets += offset
      val all = Seq(
        (Seq("us", "mobile"), Seq("10", "1.5")),
        (Seq("us", "web"), Seq("20", "2.5")),
        (Seq("id", "mobile"), Seq("30", "3.5")))
      GoogleAnalytics.Report(3L, Seq("country", "platform"),
        Seq("sessions", "bounceRate"),
        all.slice(offset.toInt, (offset + limit).toInt))
    }
  }

  test("ga runReport pages by limit/offset; dims+metrics land as strings (source.go:55-99)") {
    val client = new FakeGa
    val df = GoogleAnalytics.read(spark, client, "p1", "2026-01-01", "2026-01-31",
      Seq("country", "platform"), Seq("sessions", "bounceRate"), batchSize = 2L)
    assert(client.offsets.toSeq == Seq(0L, 2L))
    assert(df.columns.toSeq == Seq("country", "platform", "sessions", "bounceRate"))
    assert(df.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.StringType))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    assert(rows == Seq(("id", "mobile", "30"), ("us", "mobile", "10"), ("us", "web", "20")))
  }

  // ---- registry wiring ------------------------------------------------

  test("pipeline --from=SF/GMAIL/GA route through injected clients") {
    import graft.pipeline.Pipeline
    val sf = Pipeline.source(spark, Pipeline.Spec("SF", Nil,
      Map("SF__SOQL" -> "SELECT Id FROM Lead"),
      clients = Map("SF" -> new FakeSfClient)))
    assert(sf.count() == 5)
    val gm = Pipeline.source(spark, Pipeline.Spec("GMAIL", Nil,
      Map("GMAIL__FILTER_RULES" -> "f"), clients = Map("GMAIL" -> new FakeGmail)))
    assert(gm.count() == 3)
    val ga = Pipeline.source(spark, Pipeline.Spec("GA", Nil,
      Map("GA__PROPERTY_ID" -> "p1", "GA__DIMENSIONS" -> "country,platform",
        "GA__METRICS" -> "sessions,bounceRate", "GA__BATCH_SIZE" -> "2"),
      clients = Map("GA" -> new FakeGa)))
    assert(ga.count() == 3)
  }
}

class OAuth2Spec extends org.scalatest.funsuite.AnyFunSuite {

  class FakeHttp(var expiresIn: String = "3600") extends OAuth2.HttpPost {
    val calls = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, String])]
    def post(url: String, headers: Map[String, String]): String = {
      calls += ((url, headers))
      s"""{"access_token":"tok-${calls.size}","token_type":"Bearer","expires_in":"$expiresIn"}"""
    }
  }

  test("client-credentials flow: basic auth POST, string expires_in, cached reuse") {
    val http = new FakeHttp
    var now = 1_000_000L
    val cc = new OAuth2.ClientCredentials(
      "https://auth.example.com/token", "cid", "csec", http, () => now)
    assert(cc.token().accessToken == "tok-1")
    assert(cc.token().accessToken == "tok-1") // cached (ReuseTokenSource)
    assert(http.calls.size == 1)
    val (url, headers) = http.calls.head
    assert(url == "https://auth.example.com/token?grant_type=client_credentials")
    val expected = java.util.Base64.getEncoder.encodeToString("cid:csec".getBytes)
    assert(headers("Authorization") == s"Basic $expected")
    assert(headers("Content-Type") == "application/json")
    // expiry triggers refetch
    now += 3600 * 1000L
    assert(cc.token().accessToken == "tok-2")
    assert(cc.authHeader() == ("Authorization" -> "Bearer tok-2"))
  }

  test("jsonField handles string and numeric values") {
    assert(OAuth2.jsonField("""{"a":"x\"y","b":12}""", "a").contains("x\"y"))
    assert(OAuth2.jsonField("""{"a":"x","b":12}""", "b").contains("12"))
    assert(OAuth2.jsonField("""{"a":"x"}""", "c").isEmpty)
  }
}
