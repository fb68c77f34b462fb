package graft.util

/** OAuth2 client-credentials flow (reference
  * internal/ext/auth/clientcredentials/custom_provider_a.go).
  *
  * Contract: POST `<tokenUrl>?grant_type=client_credentials` with
  * `Authorization: Basic base64(id:secret)` and a JSON content type;
  * the response carries `access_token` and `expires_in` (SECONDS, as a
  * STRING — provider A quirk, custom_provider_a.go:33-37); the token is
  * cached and reused until expiry (oauth2.ReuseTokenSource semantics).
  */
object OAuth2 {

  trait HttpPost extends Serializable {
    /** POST; returns the response body. Throw on non-2xx. */
    def post(url: String, headers: Map[String, String]): String
  }

  case class Token(accessToken: String, tokenType: String, expiresAtMs: Long) {
    def valid(nowMs: Long): Boolean =
      accessToken.nonEmpty && nowMs < expiresAtMs - 10_000 // early-expiry guard
  }

  class ClientCredentials(
      tokenUrl: String,
      clientId: String,
      clientSecret: String,
      http: HttpPost,
      clock: () => Long = () => System.currentTimeMillis)
    extends Serializable {

    @transient private var cached: Token = _

    /** Bearer token, fetched on first use and on expiry. */
    def token(): Token = synchronized {
      val now = clock()
      if (cached == null || !cached.valid(now)) cached = fetch(now)
      cached
    }

    def authHeader(): (String, String) =
      "Authorization" -> s"Bearer ${token().accessToken}"

    private def fetch(nowMs: Long): Token = {
      val basic = java.util.Base64.getEncoder
        .encodeToString(s"$clientId:$clientSecret".getBytes("UTF-8"))
      val body = http.post(
        s"$tokenUrl?grant_type=client_credentials",
        Map(
          "Content-Type" -> "application/json",
          "Authorization" -> s"Basic $basic"))
      val accessToken = jsonField(body, "access_token")
        .getOrElse(sys.error(s"no access_token in token response: $body"))
      // expires_in arrives as a string of seconds (custom_provider_a.go:105)
      val expiresIn = jsonField(body, "expires_in").map(_.toLong).getOrElse(3600L)
      Token(accessToken, jsonField(body, "token_type").getOrElse("Bearer"),
        nowMs + expiresIn * 1000)
    }
  }

  /** Minimal flat-JSON field extraction (string or number values). */
  private[graft] def jsonField(json: String, name: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("\"" + java.util.regex.Pattern.quote(name) +
        "\"\\s*:\\s*(?:\"((?:[^\"\\\\]|\\\\.)*)\"|([-0-9.eE+]+))")
      .matcher(json)
    if (m.find())
      Option(m.group(1)).map(unescape).orElse(Option(m.group(2)))
    else None
  }

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")
      .replace("\\n", "\n").replace("\\r", "\r").replace("\\t", "\t")
}
