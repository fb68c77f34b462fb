package graft.util

/** Connectivity dry-run probe (reference internal/ext/net/check.go:11-49).
  *
  * Accepts either a URL (`http://host[:port]/...`) or a bare
  * `host:port`. URL form derives the port from the scheme when absent
  * (http→80, https→443; anything else is an error, check.go:25-32);
  * then a plain TCP connect proves reachability.
  */
object Net {

  def hostPort(address: String): (String, Int) = {
    val u =
      try new java.net.URI(address)
      catch { case _: java.net.URISyntaxException => null }
    if (u != null && u.getHost != null) {
      val port =
        if (u.getPort >= 0) u.getPort
        else u.getScheme match {
          case "http" => 80
          case "https" => 443
          case s => sys.error(s"unsupported scheme: $s")
        }
      (u.getHost, port)
    } else {
      val idx = address.lastIndexOf(':')
      if (idx <= 0 || idx == address.length - 1)
        sys.error(s"address must be host:port or a URL: $address")
      (address.substring(0, idx), address.substring(idx + 1).toInt)
    }
  }

  /** TCP dial; throws on unreachable. */
  def connCheck(address: String, timeoutMs: Int = 5000): Unit = {
    val (host, port) = hostPort(address)
    val s = new java.net.Socket()
    try s.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
    finally s.close()
  }
}
