package graft.util

import java.io.ByteArrayInputStream
import java.security.cert.{CertificateFactory, X509Certificate}
import java.security.{KeyFactory, KeyStore, PrivateKey, SecureRandom}
import java.security.spec.PKCS8EncodedKeySpec
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManager, TrustManagerFactory, X509TrustManager}

/** TLS options for network connectors (reference
  * `internal/ext/auth/tls.go:11-27`): a client certificate + key pair
  * and/or a private CA bundle, all as PEM *contents* (the reference's
  * `<COMP>__CONNECTION_TLS_CERT/KEY/CACERT` env values are the PEM
  * text, not paths — internal/config/sink_http.go:12-14).
  *
  * Mapping onto the JVM: the CA bundle becomes the `TrustManager`
  * (Go `RootCAs`), the keypair becomes the `KeyManager`
  * (Go `Certificates`), composed into one `SSLContext` that the JDK
  * HTTP client / SSL sockets consume. `insecureSkipVerify` mirrors
  * Go's field of the same name: chain validation is skipped (the JDK
  * client still enforces hostname↔SAN match — disable that JVM-wide
  * with `jdk.internal.httpclient.disableHostnameVerification` if a
  * test server's cert has no SAN).
  */
object Tls {

  case class Config(
      cert: Option[String] = None, // client certificate chain, PEM
      key: Option[String] = None, // PKCS#8 private key, PEM
      caCert: Option[String] = None, // trusted CA bundle, PEM
      insecureSkipVerify: Boolean = false) {
    require(cert.isDefined == key.isDefined,
      "TLS client auth needs BOTH cert and key (tls.X509KeyPair)")
  }

  /** `<COMP>__CONNECTION_TLS_*` env → Config; None when no TLS key is
    * present so plain-HTTP pipelines skip the SSLContext entirely.
    */
  def fromEnv(env: Map[String, String], comp: String): Option[Config] = {
    def e(k: String): Option[String] =
      env.get(s"${comp}__CONNECTION_TLS_$k").filter(_.trim.nonEmpty)
    val cfg = Config(
      cert = e("CERT"), key = e("KEY"), caCert = e("CACERT"),
      insecureSkipVerify = e("SKIP_VERIFY").exists(_.toBoolean))
    if (cfg.cert.isEmpty && cfg.caCert.isEmpty && !cfg.insecureSkipVerify) None
    else Some(cfg)
  }

  def parseCertificates(pem: String): Seq[X509Certificate] = {
    val cf = CertificateFactory.getInstance("X.509")
    val certs = cf.generateCertificates(
      new ByteArrayInputStream(pem.getBytes("UTF-8")))
    val out = scala.collection.mutable.ArrayBuffer.empty[X509Certificate]
    certs.forEach(c => out += c.asInstanceOf[X509Certificate])
    require(out.nonEmpty, "failed to append CA certificate") // tls.go:19-21
    out.toSeq
  }

  /** PKCS#8 PEM (`BEGIN PRIVATE KEY`) → PrivateKey; tries RSA then EC
    * then Ed25519 (the JDK needs the right KeyFactory per algorithm).
    */
  def parsePrivateKey(pem: String): PrivateKey = {
    val body = pem.linesIterator
      .filterNot(l => l.startsWith("-----") || l.trim.isEmpty)
      .mkString
    val der = java.util.Base64.getMimeDecoder.decode(body)
    require(pem.contains("BEGIN PRIVATE KEY"),
      "TLS key must be an unencrypted PKCS#8 PEM (BEGIN PRIVATE KEY); " +
        "convert PKCS#1/SEC1 keys with `openssl pkcs8 -topk8 -nocrypt`")
    val spec = new PKCS8EncodedKeySpec(der)
    val algos = Seq("RSA", "EC", "Ed25519")
    algos.iterator.flatMap { a =>
      try Some(KeyFactory.getInstance(a).generatePrivate(spec))
      catch { case _: java.security.spec.InvalidKeySpecException => None }
    }.nextOption().getOrElse(
      sys.error(s"private key is none of ${algos.mkString("/")}"))
  }

  /** Build the SSLContext (NewTLSConfig, tls.go:11-27). */
  def sslContext(cfg: Config): SSLContext = {
    val keyManagers = (cfg.cert, cfg.key) match {
      case (Some(certPem), Some(keyPem)) =>
        val chain = parseCertificates(certPem)
        val key = parsePrivateKey(keyPem)
        val ks = KeyStore.getInstance("PKCS12")
        ks.load(null, null)
        ks.setKeyEntry("client", key, Array.emptyCharArray, chain.toArray)
        val kmf = KeyManagerFactory.getInstance(
          KeyManagerFactory.getDefaultAlgorithm)
        kmf.init(ks, Array.emptyCharArray)
        kmf.getKeyManagers
      case _ => null
    }
    val trustManagers: Array[TrustManager] =
      if (cfg.insecureSkipVerify) Array(new X509TrustManager {
        def checkClientTrusted(c: Array[X509Certificate], a: String): Unit = ()
        def checkServerTrusted(c: Array[X509Certificate], a: String): Unit = ()
        def getAcceptedIssuers: Array[X509Certificate] = Array.empty
      })
      else cfg.caCert match {
        case Some(caPem) =>
          val ks = KeyStore.getInstance("PKCS12")
          ks.load(null, null)
          parseCertificates(caPem).zipWithIndex.foreach { case (c, i) =>
            ks.setCertificateEntry(s"ca$i", c)
          }
          val tmf = TrustManagerFactory.getInstance(
            TrustManagerFactory.getDefaultAlgorithm)
          tmf.init(ks)
          tmf.getTrustManagers
        case None => null // JVM default trust store
      }
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(keyManagers, trustManagers, new SecureRandom())
    ctx
  }
}
