package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.Meta
import graft.sinks.FileSink
import graft.sources.FileSource
import graft.transform.{Jq, SqlScript}

/** Pipeline spec + runner — the Spark shape of the reference CLI
  * `any2any --from=SRC --to=SINK [--to=SINK2] [--env=K=V]`
  * (main.go:11-40, any2any.go:22-103).
  *
  * Configuration keeps the reference's `<COMPONENT>__<KEY>` convention
  * (internal/config/util.go:14-26): `FILE__SOURCE_URI`,
  * `JQ__QUERY`, `FILE__DESTINATION_URI`, ... passed as a plain map.
  *
  * Execution model: construction builds ONE DataFrame plan
  * (read → transform); `run` materializes it once (`persist`) and
  * fans out to every sink (MultiSinkPipeline D5 — the reference
  * duplicates the stream to all sink inlets, connector.go:137-139;
  * Spark caches the transformed frame and runs one write job per
  * sink). A reference-parity transfer is a narrow, shuffle-free plan.
  */
object Pipeline {

  case class Spec(
      from: String,
      to: Seq[String],
      env: Map[String, String] = Map.empty,
      dryRun: Boolean = false,
      /** Injectable transports keyed by sink name (e.g. "PSQL" →
        * PgSink.PgClientFactory). Connectors whose protocol has no
        * sandbox-testable endpoint take their client here; absent, the
        * built-in path (JDBC writer, …) is used.
        */
      clients: Map[String, AnyRef] = Map.empty)

  case class Result(
      rows: Option[Long], // populated when >1 sink (counted via persist)
      sinkOutputs: Map[String, Seq[String]],
      plans: Seq[String], // explain output on dry-run
      /** sink → "ok" | error message; dry-run connectivity probes
        * (reference DryRunable + ConnCheck, check.go:11-49).
        */
      connChecks: Map[String, String] = Map.empty)

  private def key(env: Map[String, String], component: String, k: String): Option[String] =
    env.get(s"${component}__$k")

  /** Build the source DataFrame (registry ≅ component.go:61-134). */
  def source(spark: SparkSession, spec: Spec): DataFrame = spec.from.toUpperCase match {
    case "FILE" | "OSS" | "S3" =>
      // S3 auth env → fs.s3a.* before the scan plans (K4/S-family;
      // ext/s3/sink.go:39-51)
      if (spec.from.equalsIgnoreCase("S3")) graft.util.S3Conf(spark, spec.env)
      val uri = key(spec.env, spec.from.toUpperCase, "SOURCE_URI")
        .getOrElse(sys.error(s"${spec.from}__SOURCE_URI required"))
      FileSource.read(spark, uri,
        skipHeader = key(spec.env, spec.from.toUpperCase, "CSV_SKIP_HEADER")
          .forall(_.toBoolean),
        skipRows = key(spec.env, spec.from.toUpperCase, "CSV_SKIP_ROWS")
          .map(_.toInt).getOrElse(0))
    case "SQL" | "MC" =>
      key(spec.env, "MC", "QUERY_FILE_PATH") match {
        case Some(qPath) =>
          // pre-query × query-template loop — the reference's main
          // production entry (ext/maxcompute/source.go:135-247)
          val preQuery = key(spec.env, "MC", "PRE_QUERY_FILE_PATH").map { pp =>
            QueryLoop.readQueryFiles(spark, pp).headOption.map(_._2).getOrElse("")
          }.getOrElse("")
          val out = QueryLoop.run(spark, QueryLoop.Spec(
            preQuery = preQuery,
            preQueryFilename = key(spec.env, "MC", "PRE_QUERY_FILE_PATH")
              .map(p => new org.apache.hadoop.fs.Path(p).getName).getOrElse(""),
            queryFiles = QueryLoop.readQueryFiles(spark, qPath),
            filenameColumn = key(spec.env, "MC", "FILENAME_COLUMN")
              .getOrElse(Meta.FilenameCol)), dryRun = spec.dryRun)
          if (spec.dryRun) {
            // reference dry-run surfaces the generated queries without
            // running them (source.go:200-205); expose them as the frame
            import spark.implicits._
            out.compiled.toDF("filename", "generated_query")
          } else out.merged.getOrElse(sys.error("query loop produced no result"))
        case None =>
          // SQL front door (reference MC source §3.2): run a
          // (multi-statement) script through SqlScript; the last
          // statement's result is the source
          val q = key(spec.env, "MC", "QUERY").orElse(key(spec.env, "SQL", "QUERY"))
            .getOrElse(sys.error("SQL__QUERY / MC__QUERY required"))
          SqlScript.run(spark, q, dryRun = false)
            .getOrElse(sys.error("query script produced no result"))
      }
    case "HTTP" =>
      // S8: one GET, NDJSON body → records (ext/http/source.go:78-132);
      // HTTP__CONNECTION_TLS_* env (PEM contents) → SSLContext
      val doer = spec.clients.get("HTTP") match {
        case Some(d: graft.sources.Http.HttpDoer) => d
        case _ => new graft.sources.Http.JdkHttpDoer(
          tls = graft.util.Tls.fromEnv(spec.env, "HTTP"))
      }
      graft.sources.Http.readNdjson(spark,
        endpoint = key(spec.env, "HTTP", "ENDPOINT")
          .getOrElse(sys.error("HTTP__ENDPOINT required")),
        headers = httpHeaders(spark, spec),
        oauth = oauthFromEnv(spec, "HTTP"),
        doer = doer)
    case "SF" =>
      // S5: SOQL pagination over an injected client (source.go:64-151)
      val client = spec.clients.get("SF") match {
        case Some(c: graft.sources.Salesforce.Client) => c
        case _ => sys.error("SF source requires an injected Salesforce client")
      }
      val soql = key(spec.env, "SF", "SOQL_FILE_PATH")
        .map(p => QueryLoop.readQueryFiles(spark, p).headOption.map(_._2).getOrElse(""))
        .orElse(key(spec.env, "SF", "SOQL"))
        .getOrElse(sys.error("SF__SOQL_FILE_PATH / SF__SOQL required"))
      graft.sources.Salesforce.read(spark, client, soql,
        includeDeleted = key(spec.env, "SF", "INCLUDE_DELETED").exists(_.toBoolean))
    case "GMAIL" =>
      // S6: attachment download + decode (source.go:64-162)
      val svc = spec.clients.get("GMAIL") match {
        case Some(s: graft.sources.Gmail.Service) => s
        case _ => sys.error("GMAIL source requires an injected Gmail service")
      }
      graft.sources.Gmail.read(spark, svc,
        filterRules = key(spec.env, "GMAIL", "FILTER_RULES").getOrElse(""),
        filenameColumn = key(spec.env, "GMAIL", "FILENAME_COLUMN")
          .getOrElse(Meta.FilenameCol),
        csvDelimiter = key(spec.env, "GMAIL", "CSV_DELIMITER")
          .map(_.head).getOrElse(','))
    case "GA" =>
      // S7: runReport limit/offset paging (source.go:55-131)
      val client = spec.clients.get("GA") match {
        case Some(c: graft.sources.GoogleAnalytics.Client) => c
        case _ => sys.error("GA source requires an injected GA client")
      }
      graft.sources.GoogleAnalytics.read(spark, client,
        propertyId = key(spec.env, "GA", "PROPERTY_ID")
          .getOrElse(sys.error("GA__PROPERTY_ID required")),
        startDate = key(spec.env, "GA", "START_DATE").getOrElse(""),
        endDate = key(spec.env, "GA", "END_DATE").getOrElse(""),
        dimensions = key(spec.env, "GA", "DIMENSIONS")
          .map(_.split(',').toSeq.map(_.trim)).getOrElse(Nil),
        metrics = key(spec.env, "GA", "METRICS")
          .map(_.split(',').toSeq.map(_.trim)).getOrElse(Nil),
        batchSize = key(spec.env, "GA", "BATCH_SIZE").map(_.toLong).getOrElse(1000L))
    case "JDBC" | "PSQL" =>
      val rdr = spark.read.format("jdbc")
        .option("url", key(spec.env, "PSQL", "DSN")
          .orElse(key(spec.env, "JDBC", "URL"))
          .getOrElse(sys.error("PSQL__DSN / JDBC__URL required")))
      key(spec.env, "PSQL", "QUERY").orElse(key(spec.env, "JDBC", "QUERY"))
        .map(q => rdr.option("query", q))
        .getOrElse(rdr.option("dbtable",
          key(spec.env, "JDBC", "TABLE").getOrElse(sys.error("query or table required"))))
        .load()
    case other => sys.error(s"unknown source: $other")
  }

  /** Apply the processor chain (connector D8/D9): jq program, then
    * optional record-index stamping.
    */
  def transform(df: DataFrame, spec: Spec): DataFrame = {
    // jq programs inside the compiled subset run as Catalyst columns;
    // anything else falls back to the real-jq escape hatch (§7.3).
    // Subset misses surface when the compiled transform is APPLIED to
    // the frame (plan construction), so the fallback wraps application.
    val jq: DataFrame => DataFrame = key(spec.env, "JQ", "QUERY") match {
      // templated programs ([[ ]] over record fields) route through the
      // per-program grouping path (connector.go:57-95); plain programs
      // compile once, with the real-jq escape hatch on subset misses
      case Some(q) => d => Jq.applyTemplated(d, q)
      case None => identity
    }
    val withIndex: DataFrame => DataFrame =
      if (key(spec.env, "GRAFT", "RECORD_INDEX").exists(_.toBoolean))
        d => Meta.withBatchIndex(
          Meta.withRecordIndex(d, d.columns.headOption.map(col).toSeq),
          key(spec.env, "GRAFT", "CONNECTOR_BATCH_SIZE")
            .map(_.toInt).getOrElse(Meta.DefaultBatchSize))
      else identity
    withIndex(jq(df))
  }

  /** "K: V"-line headers from HTTP__HEADERS_FILE_PATH or the packed
    * HTTP__HEADER "k:v,k2:v2" form (internal/config/sink_http.go:7-8).
    */
  private def httpHeaders(spark: SparkSession, spec: Spec): Map[String, Seq[String]] =
    key(spec.env, "HTTP", "HEADERS_FILE_PATH")
      .map(p => graft.sources.Http.parseHeaders(
        QueryLoop.readQueryFiles(spark, p).headOption.map(_._2).getOrElse("")))
      .orElse(key(spec.env, "HTTP", "HEADER").map(h =>
        graft.sources.Http.parseHeaders(h.split(',').mkString("\n"))))
      .getOrElse(Map.empty)

  /** OAuth2 client-credentials config (HTTP__CLIENT_CREDENTIALS_*,
    * internal/config/sink_http.go:15-18), over the JDK HTTP client.
    */
  private def oauthFromEnv(spec: Spec, comp: String): Option[graft.util.OAuth2.ClientCredentials] =
    for {
      id <- key(spec.env, comp, "CLIENT_CREDENTIALS_CLIENT_ID").filter(_.nonEmpty)
      secret <- key(spec.env, comp, "CLIENT_CREDENTIALS_CLIENT_SECRET").filter(_.nonEmpty)
      url <- key(spec.env, comp, "CLIENT_CREDENTIALS_TOKEN_URL").filter(_.nonEmpty)
    } yield new graft.util.OAuth2.ClientCredentials(url, id, secret,
      new graft.util.OAuth2.HttpPost {
        def post(u: String, headers: Map[String, String]): String = {
          val (status, body) = new graft.sources.Http.JdkHttpDoer()
            .send("POST", u, headers.view.mapValues(Seq(_)).toMap, None)
          if (status != 200) sys.error(s"failed to get token: $status, response: $body")
          body
        }
      })

  /** Write to one sink (registry ≅ component.go:138-224). Returns output
    * locations (for FILE-family) or logical names.
    */
  def sink(df: DataFrame, sinkName: String, spec: Spec): Seq[String] =
    sinkName.toUpperCase match {
      case "SFTP" =>
        // K5 (ext/sftp/sink.go + client.go): distributed format/write
        // into staging, then stream each group file over the real SSH
        // transport (password / private-key / host-fingerprint auth)
        val uri = key(spec.env, "SFTP", "DESTINATION_URI")
          .getOrElse(sys.error("SFTP__DESTINATION_URI required"))
        val (cfg, _) = graft.sinks.Sftp.parseUri(uri, spec.env)
        val factory = spec.clients.get("SFTP") match {
          case Some(f: graft.sinks.Sftp.TransportFactory) => f
          case _ => new graft.sinks.Sftp.JschFactory(cfg)
        }
        graft.sinks.Sftp.write(df, uri, FileSink.Spec(
          destinationUri = uri,
          format = key(spec.env, "SFTP", "FORMAT"),
          header = key(spec.env, "SFTP", "CSV_HEADER").forall(_.toBoolean),
          compression = key(spec.env, "SFTP", "COMPRESSION_TYPE"),
          maxRecordsPerFile = key(spec.env, "SFTP", "MAX_TEMP_FILE_RECORD_NUMBER")
            .map(_.toLong).getOrElse(0L),
          jsonPath = key(spec.env, "SFTP", "JSONPATH_SELECTOR")),
          factory, cfg.enableOverwrite)
      case "FILE" | "OSS" | "S3" =>
        if (sinkName.equalsIgnoreCase("S3"))
          graft.util.S3Conf(df.sparkSession, spec.env)
        val uri = key(spec.env, sinkName.toUpperCase, "DESTINATION_URI")
          .getOrElse(sys.error(s"${sinkName}__DESTINATION_URI required"))
        FileSink.write(df, FileSink.Spec(
          destinationUri = uri,
          format = key(spec.env, sinkName.toUpperCase, "FORMAT"),
          header = key(spec.env, sinkName.toUpperCase, "CSV_HEADER").forall(_.toBoolean),
          compression = key(spec.env, sinkName.toUpperCase, "COMPRESSION_TYPE"),
          maxRecordsPerFile = key(spec.env, sinkName.toUpperCase, "MAX_TEMP_FILE_RECORD_NUMBER")
            .map(_.toLong).getOrElse(0L),
          jsonPath = key(spec.env, sinkName.toUpperCase, "JSON_PATH_SELECTOR"),
          goFloatFormat = key(spec.env, sinkName.toUpperCase, "GO_FLOAT_FORMAT")
            .exists(_.toBoolean)))
      case "TABLE" | "MC" =>
        // warehouse table sink (K2): APPEND or REPLACE (truncate+insert)
        val table = key(spec.env, "MC", "DESTINATION_TABLE_ID")
          .orElse(key(spec.env, "TABLE", "NAME"))
          .getOrElse(sys.error("TABLE__NAME / MC__DESTINATION_TABLE_ID required"))
        val mode = key(spec.env, "MC", "LOAD_METHOD")
          .orElse(key(spec.env, "TABLE", "MODE")).getOrElse("APPEND")
        TableSink.write(df, table, mode)
        Seq(table)
      case "KAFKA" =>
        val out = df.selectExpr("CAST(null AS STRING) AS key",
          "to_json(struct(*)) AS value")
        out.write.format("kafka")
          .option("kafka.bootstrap.servers",
            key(spec.env, "KAFKA", "BOOTSTRAP_SERVERS").getOrElse("localhost:9092"))
          .option("topic", key(spec.env, "KAFKA", "TOPIC").getOrElse("graft"))
          .save()
        Seq("kafka")
      case "IO" =>
        // stdout sink (K11): NDJSON lines, like the reference's
        // streaming stdout (ext/io/sink.go:16-45). toLocalIterator
        // pulls ONE partition at a time onto the driver — collect()
        // here was a driver-OOM for an operator users point at
        // arbitrary frames.
        df.toJSON.toLocalIterator().forEachRemaining(println(_))
        Seq("stdout")
      case "HTTP" =>
        // K9 (ext/http/sink.go:122-240): records group by their compiled
        // endpoint; batches flush as one request each over the real JDK
        // client (or an injected doer)
        val doer = spec.clients.get("HTTP") match {
          case Some(d: graft.sources.Http.HttpDoer) => d
          case _ => new graft.sources.Http.JdkHttpDoer(
            tls = graft.util.Tls.fromEnv(spec.env, "HTTP"))
        }
        val endpoint = key(spec.env, "HTTP", "ENDPOINT")
          .orElse(key(spec.env, "HTTP", "DESTINATION_URI"))
          .getOrElse(sys.error("HTTP__ENDPOINT required"))
        graft.sinks.PartitionSinks.writeGrouped(df, endpoint,
          new graft.sources.Http.SinkClientFactory(
            method = key(spec.env, "HTTP", "METHOD").getOrElse("POST"),
            headers = httpHeaders(df.sparkSession, spec),
            oauth = oauthFromEnv(spec, "HTTP"),
            doer = doer),
          batchSize = key(spec.env, "HTTP", "BATCH_SIZE").map(_.toInt).getOrElse(1))
        Seq(endpoint)
      case "SMTP" =>
        // K6 (ext/smtp/sink.go): grouped attachment write + MIME compose;
        // the SMTP transport itself is injected (no server in sandbox)
        val mailer = spec.clients.get("SMTP") match {
          case Some(m: graft.sinks.Smtp.Mailer) => m
          case _ => sys.error("SMTP sink requires an injected Mailer client")
        }
        def fileOrInline(fileKey: String, inlineKey: String): String =
          key(spec.env, "SMTP", fileKey)
            .map(p => QueryLoop.readQueryFiles(df.sparkSession, p).headOption
              .map(_._2).getOrElse(""))
            .orElse(key(spec.env, "SMTP", inlineKey)).getOrElse("")
        val emails = graft.sinks.Smtp.write(df, graft.sinks.Smtp.Config(
          from = key(spec.env, "SMTP", "FROM").getOrElse(sys.error("SMTP__FROM required")),
          to = key(spec.env, "SMTP", "TO").getOrElse(sys.error("SMTP__TO required")),
          subject = key(spec.env, "SMTP", "SUBJECT").getOrElse(""),
          bodyTemplate = fileOrInline("BODY_FILE_PATH", "BODY"),
          bodyNoRecord = fileOrInline("BODY_NO_RECORD_FILE_PATH", "BODY_NO_RECORD"),
          attachmentFilename = key(spec.env, "SMTP", "ATTACHMENT_FILENAME")
            .getOrElse("attachment.json"),
          storageMode = key(spec.env, "SMTP", "STORAGE_MODE").getOrElse("attachment"),
          storageDir = key(spec.env, "SMTP", "STORAGE_DESTINATION_DIR")
            .getOrElse("/tmp/graft_smtp")),
          mailer, dryRun = spec.dryRun)
        emails.map(e => s"smtp:${e.to.mkString(",")}")
      case "REDIS" =>
        // K8 (ext/redis/sink.go:35-170): templated key/value per record,
        // MSET batches over the RESP transport (or an injected client)
        val factory = spec.clients.get("REDIS") match {
          case Some(f: graft.sinks.PartitionSinks.ClientFactory) => f
          case _ => new graft.sinks.Redis.ClientFactory(
            key(spec.env, "REDIS", "CONNECTION_DSN")
              .getOrElse(sys.error("REDIS__CONNECTION_DSN required")),
            tls = graft.util.Tls.fromEnv(spec.env, "REDIS"))
        }
        graft.sinks.PartitionSinks.writeKeyValue(df,
          keyTemplate = key(spec.env, "REDIS", "RECORD_KEY")
            .getOrElse(sys.error("REDIS__RECORD_KEY required")),
          valueTemplate = key(spec.env, "REDIS", "RECORD_VALUE"),
          factory = factory,
          batchSize = key(spec.env, "REDIS", "BATCH_SIZE")
            .map(_.toInt).getOrElse(512))
        Seq("redis")
      case "PSQL" | "JDBC" =>
        // K7 (ext/postgresql/sink.go:35-191): COPY-shaped batched path
        // through an injected transport; plain Spark JDBC append when
        // only a DSN is configured.
        val table = key(spec.env, "PSQL", "DESTINATION_TABLE_ID")
          .orElse(key(spec.env, "JDBC", "TABLE"))
          .getOrElse(sys.error("PSQL__DESTINATION_TABLE_ID / JDBC__TABLE required"))
        spec.clients.get("PSQL") match {
          case Some(f: graft.sinks.PgSink.PgClientFactory) =>
            graft.sinks.PgSink.write(df, graft.sinks.PgSink.Spec(
              table = table,
              preSql = key(spec.env, "PSQL", "PRE_SQL_SCRIPT"),
              batchSize = key(spec.env, "PSQL", "BATCH_SIZE")
                .map(_.toInt).getOrElse(512),
              dryRun = spec.dryRun), f)
          case _ =>
            val dsn = key(spec.env, "PSQL", "CONNECTION_DSN")
              .orElse(key(spec.env, "JDBC", "URL"))
              .getOrElse(sys.error("PSQL__CONNECTION_DSN / JDBC__URL required"))
            df.write.format("jdbc")
              .option("url", dsn).option("dbtable", table)
              .mode(SaveMode.Append).save()
        }
        Seq(table)
      case other => sys.error(s"unknown sink: $other")
    }

  /** Dry-run connectivity probe per sink (D15; reference substitutes
    * ConnCheck for the real emit, e.g. pg sink.go:184-189, http). Only
    * sinks with a network endpoint are probed; file-family sinks are
    * "ok" by construction (the explain already proves the plan).
    */
  private def connCheck(sinkName: String, spec: Spec): Option[(String, String)] = {
    def probe(addr: String): String =
      try { graft.util.Net.connCheck(addr); "ok" }
      catch { case scala.util.control.NonFatal(e) => s"unreachable: ${e.getMessage}" }
    sinkName.toUpperCase match {
      case "PSQL" | "JDBC" =>
        spec.clients.get("PSQL") match {
          case Some(f: graft.sinks.PgSink.PgClientFactory) =>
            val c = f.create()
            val r = try { c.connCheck(); "ok" }
            catch { case scala.util.control.NonFatal(e) => s"unreachable: ${e.getMessage}" }
            finally c.close()
            Some(sinkName -> r)
          case _ =>
            key(spec.env, "PSQL", "CONNECTION_DSN").orElse(key(spec.env, "JDBC", "URL"))
              .map(dsn => sinkName -> probe(dsn.stripPrefix("jdbc:")))
        }
      case "HTTP" =>
        key(spec.env, "HTTP", "ENDPOINT")
          .orElse(key(spec.env, "HTTP", "DESTINATION_URI"))
          .map(u => sinkName -> probe(u))
      case "SMTP" =>
        key(spec.env, "SMTP", "CONNECTION_DSN").map { dsn =>
          val (h, p, _, _) = graft.sinks.Smtp.parseDsn(dsn)
          sinkName -> probe(s"$h:$p")
        }
      case "REDIS" =>
        key(spec.env, "REDIS", "CONNECTION_DSN").map { dsn =>
          val (h, p, _) = graft.sinks.Redis.parseDsn(dsn)
          sinkName -> probe(s"$h:$p")
        }
      case "KAFKA" =>
        key(spec.env, "KAFKA", "BOOTSTRAP_SERVERS")
          .map(bs => sinkName -> probe(bs.split(',').head.trim))
      case _ => None
    }
  }

  def run(spark: SparkSession, spec: Spec): Result = {
    // record-count metrics ride the plan itself (commonmetric.go
    // recordCount, as a map-side observation — no extra pass)
    val plan = graft.util.Metrics.observe(
      transform(source(spark, spec), spec), "pipeline")
    if (spec.dryRun) {
      // D15: explain (no data side effects) + per-sink connectivity
      // probes, mirroring the reference's DryRunable/ConnCheck split
      return Result(None, Map.empty,
        Seq(plan.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)),
        connChecks = spec.to.flatMap(s => connCheck(s, spec)).toMap)
    }
    if (spec.to.size <= 1) {
      val outs = spec.to.headOption.map(s => s -> sink(plan, s, spec)).toMap
      Result(None, outs, Nil)
    } else {
      // MultiSinkPipeline (D5): materialize once, write N times
      val cached = plan.persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val n = cached.count()
        val outs = spec.to.map(s => s -> sink(cached, s, spec)).toMap
        Result(Some(n), outs, Nil)
      } finally cached.unpersist()
    }
  }
}

/** Warehouse table sink (reference MC sink K2): APPEND adds rows;
  * REPLACE reproduces the temp-table + INSERT OVERWRITE dance
  * (ext/maxcompute/util.go:89-137) as a transactional overwrite.
  * Schema-driven cast (util.go:436-663): incoming columns are cast to
  * the target table's types, matched case-insensitively.
  */
object TableSink {
  def write(df: DataFrame, table: String, mode: String): Unit = {
    val spark = df.sparkSession
    val exists = spark.catalog.tableExists(table)
    val aligned = if (exists) {
      val target = spark.table(table).schema
      val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
      df.select(target.fields.map { f =>
        byLower.get(f.name.toLowerCase) match {
          case Some(src) =>
            val srcType = df.schema(src).dataType
            // string→timestamp goes through the multi-format parsing
            // ladder (util.go:665-711), not a bare cast
            val c0 = (f.dataType, srcType) match {
              case (org.apache.spark.sql.types.TimestampType,
                org.apache.spark.sql.types.StringType) =>
                graft.functions.TimeParse.parseTime(col(s"`$src`"))
              case _ => col(s"`$src`").cast(f.dataType)
            }
            c0.as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }.toIndexedSeq: _*)
    } else df
    mode.toUpperCase match {
      case "REPLACE" | "OVERWRITE" =>
        if (exists) aligned.write.mode(SaveMode.Overwrite).insertInto(table)
        else aligned.write.saveAsTable(table)
      case _ => // APPEND
        if (exists) aligned.write.mode(SaveMode.Append).insertInto(table)
        else aligned.write.saveAsTable(table)
    }
  }
}
