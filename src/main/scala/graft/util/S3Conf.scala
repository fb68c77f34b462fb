package graft.util

import org.apache.spark.sql.SparkSession

/** S3 auth config → Hadoop `fs.s3a.*` mapping (reference
  * `internal/config/sink_s3.go:1-16`, `ext/s3/sink.go:39-51`,
  * `ext/s3/util.go:8-23`).
  *
  * The reference feeds the AWS SDK a static credentials provider parsed
  * from the `S3__CREDENTIALS` JSON blob
  * (`{"aws_access_key_id":..,"aws_secret_access_key":..,
  * "aws_session_token":..}`) plus `S3__REGION`; on Spark the same
  * credentials land on the `s3a` connector's Hadoop conf so every
  * executor's S3 client picks them up. Flat
  * `S3__ACCESS_KEY_ID`/`S3__SECRET_ACCESS_KEY`/`S3__SESSION_TOKEN` keys
  * are accepted as well (same precedence as the blob: flat wins).
  *
  * The reference's alternate `tiktok` provider
  * (`internal/ext/auth/aws/tiktok_provider.go`) exchanges client
  * key/secret for temporary credentials over a vendor API; that token
  * dance has no s3a counterpart and no sandbox-testable endpoint, so
  * `S3__PROVIDER=tiktok` is rejected loudly instead of silently
  * misbehaving.
  */
object S3Conf {

  /** Parsed static credentials (ext/s3/util.go:8-12). */
  case class Creds(accessKeyId: String, secretAccessKey: String,
      sessionToken: Option[String])

  def parseCredentials(json: String): Creds = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    def str(k: String): Option[String] =
      Option(node.get(k)).map(_.asText()).filter(_.nonEmpty)
    val id = str("aws_access_key_id")
    val secret = str("aws_secret_access_key")
    // missing id/secret is an error, like parseCredentials (util.go:19-22)
    require(id.isDefined && secret.isDefined,
      "S3__CREDENTIALS: missing aws_access_key_id or aws_secret_access_key")
    Creds(id.get, secret.get, str("aws_session_token"))
  }

  /** Map `S3__*` env onto the session's Hadoop conf. Returns the
    * `fs.s3a.*` pairs that were applied (for specs / dry-run logging).
    */
  def apply(spark: SparkSession, env: Map[String, String]): Map[String, String] = {
    def e(k: String): Option[String] = env.get(s"S3__$k").filter(_.nonEmpty)
    e("PROVIDER").foreach { p =>
      require(p.equalsIgnoreCase("aws"),
        s"S3__PROVIDER=$p not supported: only static AWS credentials map " +
          "onto fs.s3a.* (the reference's vendor token provider has no " +
          "s3a counterpart)")
    }
    val fromBlob = e("CREDENTIALS").map(parseCredentials)
    val creds = (e("ACCESS_KEY_ID"), e("SECRET_ACCESS_KEY")) match {
      case (Some(id), Some(sec)) => Some(Creds(id, sec, e("SESSION_TOKEN")))
      case _ => fromBlob
    }
    val pairs = Map.newBuilder[String, String]
    creds.foreach { c =>
      pairs += "fs.s3a.access.key" -> c.accessKeyId
      pairs += "fs.s3a.secret.key" -> c.secretAccessKey
      c.sessionToken.foreach { t =>
        pairs += "fs.s3a.session.token" -> t
        // session tokens need the temporary provider, which reads all
        // three keys; the default chain ignores the token
        pairs += "fs.s3a.aws.credentials.provider" ->
          "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
      }
    }
    e("REGION").foreach(r => pairs += "fs.s3a.endpoint.region" -> r)
    // not in the reference config (its SDK derives the endpoint), but
    // required for any S3-compatible store once region alone is not
    // enough; harmless to accept
    e("ENDPOINT").foreach(ep => pairs += "fs.s3a.endpoint" -> ep)
    e("PATH_STYLE_ACCESS").foreach(v =>
      pairs += "fs.s3a.path.style.access" -> v.toLowerCase)
    val applied = pairs.result()
    val hconf = spark.sparkContext.hadoopConfiguration
    applied.foreach { case (k, v) => hconf.set(k, v) }
    applied
  }
}
