package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sinks.PartitionSinks
import graft.util.{OAuth2, Tls}

/** Real HTTP transport (reference S8 source / K9 sink, ext/http/).
  *
  * Source (source.go:78-132): one GET to the endpoint with "K: V"-line
  * headers and optional OAuth2 bearer; the NDJSON response body becomes
  * records (the reference has no pagination either — its TODO at
  * source.go:104-106; [[FetchSource.read]] is the bounded-page variant).
  *
  * Sink (sink.go:122-240): records group by compiled (method, endpoint,
  * headers); each batch flushes as one request whose body is the NDJSON
  * batch. Dry-run substitutes a ConnCheck. The transport below is the
  * real JDK `java.net.http.HttpClient`; `HttpDoer` stays injectable so
  * specs can also fake it.
  */
object Http {

  trait HttpDoer extends Serializable {
    /** Send; returns (status, body). */
    def send(
        method: String,
        url: String,
        headers: Map[String, Seq[String]],
        body: Option[String]): (Int, String)
  }

  /** JDK-native client; built lazily per JVM (serializable-safe).
    * `tls` carries the reference's connection TLS options
    * (internal/ext/auth/tls.go:11-27 via ext/http/sink.go:79-84):
    * private-CA trust, client cert/key, skip-verify — compiled to an
    * `SSLContext` once per JVM. PEM strings serialize with the doer,
    * so executor-side clients get the same context.
    */
  class JdkHttpDoer(timeoutMs: Long = 30000, tls: Option[Tls.Config] = None)
    extends HttpDoer {
    @transient private lazy val client = {
      val b = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
      tls.foreach(cfg => b.sslContext(Tls.sslContext(cfg)))
      b.build()
    }
    def send(
        method: String,
        url: String,
        headers: Map[String, Seq[String]],
        body: Option[String]): (Int, String) = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .method(method.toUpperCase, body match {
          case Some(s) => java.net.http.HttpRequest.BodyPublishers.ofString(s)
          case None => java.net.http.HttpRequest.BodyPublishers.noBody()
        })
      headers.foreach { case (k, vs) => vs.foreach(v => b.header(k, v)) }
      val resp = client.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
  }

  /** "K: V" header lines → multimap (source.go:33-48). */
  def parseHeaders(content: String): Map[String, Seq[String]] =
    content.linesIterator.filter(_.trim.nonEmpty).map { line =>
      val i = line.indexOf(':')
      require(i > 0, s"invalid header format, expected 'key: value': $line")
      line.substring(0, i).trim -> line.substring(i + 1).split(',').toSeq.map(_.trim)
    }.toSeq.groupBy(_._1).view.mapValues(_.flatMap(_._2)).toMap

  private def withAuth(
      headers: Map[String, Seq[String]],
      oauth: Option[OAuth2.ClientCredentials]): Map[String, Seq[String]] =
    oauth.map { cc =>
      val (k, v) = cc.authHeader()
      headers + (k -> Seq(v))
    }.getOrElse(headers)

  /** S8 source: GET → NDJSON → DataFrame. Non-200 throws
    * (source.go:100-102).
    */
  def readNdjson(
      spark: SparkSession,
      endpoint: String,
      headers: Map[String, Seq[String]] = Map.empty,
      oauth: Option[OAuth2.ClientCredentials] = None,
      doer: HttpDoer = new JdkHttpDoer()): DataFrame = {
    val (status, body) = doer.send("GET", endpoint, withAuth(headers, oauth), None)
    if (status != 200)
      sys.error(s"unexpected status code: $status, expected: 200")
    FetchSource.parallelizeNdjson(spark,
      body.linesIterator.filter(_.trim.nonEmpty).toSeq)
  }

  /** K9 sink transport for [[PartitionSinks.writeGrouped]]: the group
    * key is the compiled endpoint; each batch posts as one request with
    * an NDJSON body (sink.go:198-240). Non-2xx throws so Spark's task
    * retry provides the reference's Retry loop.
    */
  class SinkClientFactory(
      method: String = "POST",
      headers: Map[String, Seq[String]] = Map.empty,
      oauth: Option[OAuth2.ClientCredentials] = None,
      doer: HttpDoer = new JdkHttpDoer())
    extends PartitionSinks.ClientFactory {
    def create(): PartitionSinks.BatchClient = new PartitionSinks.BatchClient {
      def send(group: String, batch: Seq[String]): Unit = {
        val (status, respBody) =
          doer.send(method, group, withAuth(headers, oauth), Some(batch.mkString("\n")))
        if (status < 200 || status >= 300)
          sys.error(s"http sink got status $status: $respBody")
      }
    }
  }
}
