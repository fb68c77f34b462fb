package graft.sinks

/** Real Redis transport for the key-value sink (reference K8,
  * ext/redis/sink.go:35-170): `redis://[user:pass@]host:port` DSN,
  * `MSET` batches of 2×batchSize strings (sink.go:151-170). The wire
  * protocol is RESP2 — arrays of bulk strings out, simple-string /
  * error replies back — small enough to speak directly over a socket,
  * so the sink needs no client library and stays testable against an
  * in-process fake server.
  *
  * Plugs into [[PartitionSinks.writeKeyValue]]: one connection per
  * partition, one MSET round-trip per batch.
  */
object Redis {

  /** redis://[user:pass@]host[:port] → (host, port, password). */
  def parseDsn(dsn: String): (String, Int, Option[String]) = {
    val u = new java.net.URI(dsn)
    require(u.getScheme == "redis" || u.getScheme == "rediss",
      s"invalid connection DSN scheme: ${u.getScheme}")
    val pass = Option(u.getUserInfo).map { ui =>
      val i = ui.indexOf(':')
      if (i >= 0) ui.substring(i + 1) else ui
    }.filter(_.nonEmpty)
    (u.getHost, if (u.getPort >= 0) u.getPort else 6379, pass)
  }

  /** RESP2 command encoding: array of bulk strings. */
  private[sinks] def encode(args: Seq[String]): Array[Byte] = {
    val sb = new java.io.ByteArrayOutputStream()
    sb.write(s"*${args.size}\r\n".getBytes("UTF-8"))
    args.foreach { a =>
      val b = a.getBytes("UTF-8")
      sb.write(s"$$${b.length}\r\n".getBytes("UTF-8"))
      sb.write(b)
      sb.write("\r\n".getBytes("UTF-8"))
    }
    sb.toByteArray
  }

  /** Read one reply line ("+OK", "-ERR ...", ":n", "$n" + payload). */
  private def readReply(in: java.io.InputStream): String = {
    val sb = new StringBuilder
    var prev = 0
    var c = in.read()
    while (c >= 0 && !(prev == '\r' && c == '\n')) {
      sb.append(c.toChar); prev = c; c = in.read()
    }
    val line = sb.toString.stripSuffix("\r")
    if (line.startsWith("$") && line != "$-1") {
      val n = line.drop(1).toInt
      val buf = new Array[Byte](n + 2) // payload + CRLF
      var off = 0
      while (off < buf.length) {
        val r = in.read(buf, off, buf.length - off)
        require(r >= 0, "redis connection closed mid-reply")
        off += r
      }
      new String(buf, 0, n, "UTF-8")
    } else if (line.startsWith("-")) sys.error(s"redis error reply: ${line.drop(1)}")
    else line.drop(1)
  }

  /** One socket per client (per partition); AUTH on connect when the
    * DSN carries a password. A `rediss://` scheme or an explicit
    * [[graft.util.Tls.Config]] (REDIS__CONNECTION_TLS_*,
    * internal/config/sink_redis.go:6-8) wraps the connection in TLS;
    * the config's CA/client-cert/skip-verify options apply, or the JVM
    * default trust store when only the scheme asks for TLS.
    */
  class ClientFactory(dsn: String, timeoutMs: Int = 10000,
      tls: Option[graft.util.Tls.Config] = None)
    extends PartitionSinks.ClientFactory {
    def create(): PartitionSinks.BatchClient = new PartitionSinks.BatchClient {
      private val (host, port, pass) = parseDsn(dsn)
      private var opened: java.net.Socket = null
      private def socket: java.net.Socket = {
        if (opened == null) {
          val useTls = tls.isDefined || dsn.startsWith("rediss://")
          val s: java.net.Socket = if (useTls) {
            val ctx = tls.map(graft.util.Tls.sslContext)
              .getOrElse(javax.net.ssl.SSLContext.getDefault)
            val raw = new java.net.Socket()
            raw.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
            val ssl = ctx.getSocketFactory
              .createSocket(raw, host, port, true)
              .asInstanceOf[javax.net.ssl.SSLSocket]
            ssl.startHandshake()
            ssl
          } else {
            val raw = new java.net.Socket()
            raw.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
            raw
          }
          s.setSoTimeout(timeoutMs)
          pass.foreach { p =>
            s.getOutputStream.write(encode(Seq("AUTH", p)))
            s.getOutputStream.flush()
            readReply(s.getInputStream)
          }
          opened = s
        }
        opened
      }
      /** batch = flat (k, v, k, v, ...) strings, as writeKeyValue emits. */
      def send(group: String, batch: Seq[String]): Unit = {
        if (batch.isEmpty) return
        socket.getOutputStream.write(encode("MSET" +: batch))
        socket.getOutputStream.flush()
        val reply = readReply(socket.getInputStream)
        require(reply == "OK", s"unexpected MSET reply: $reply")
      }
      override def close(): Unit = if (opened != null) opened.close()
    }
  }
}
