package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Meta
import graft.transform.{SqlScript, Template}

/** MC pre-query × query-template-file loop — the reference's main
  * production entry (ext/maxcompute/source.go:135-247).
  *
  * Contract:
  *  - the pre-query runs once; each pre-row's keys are metadata-prefixed
  *    (`RecordWithMetadata`, source.go:169) and the pre-row is emitted as
  *    a specialized metadata record with `filenameColumn` = pre-query
  *    filename (source.go:173-179);
  *  - an EMPTY pre-query still yields one empty pre-record
  *    (client_reader.go:76-79), so every query file runs exactly once;
  *  - for each pre-row × query file, the file's `[[ ]]` template is
  *    compiled against the prefixed pre-row map (source.go:184) and run;
  *  - each result record merges the pre-row's fields where the record
  *    does not already have the key — record wins (source.go:226-230) —
  *    and gets `filenameColumn` = query filename, overriding
  *    (source.go:232);
  *  - all results union into one stream.
  *
  * Spark shape: the pre-query result is control-plane (it *generates*
  * queries), so collecting it to the driver is the design, not a
  * shortcut — each (pre-row, file) pair contributes one declarative
  * DataFrame and the union stays lazy; Catalyst sees every branch and
  * the heavy lifting remains distributed.
  */
object QueryLoop {

  case class Spec(
      preQuery: String = "", // raw pre-query script; "" → one empty pre-record
      preQueryFilename: String = "",
      queryFiles: Seq[(String, String)], // (filename, raw template), run in order
      filenameColumn: String = Meta.FilenameCol, // MC__FILENAME_COLUMN default
      metadataPrefix: String = Meta.DefaultPrefix,
      /** Stamp `__METADATA__record_total_count` per executed query
        * (client_reader.go:166). Off by default: it costs one count job
        * per (pre-row, file) pair.
        */
      stampTotalCount: Boolean = false,
      /** Guard on the pre-query driver collect. Pre-rows are
        * control-plane (each generates one query per file,
        * source.go:163-179) so their cardinality is config-scale; a
        * pre-query that returns data-scale rows is a config bug that
        * would otherwise OOM the driver AND fan out rows×files query
        * jobs. Generous default, explicit failure.
        */
      maxPreRows: Int = 10000)

  case class Out(
      /** Unioned data records of every (pre-row, file) execution. */
      data: Option[DataFrame],
      /** Pre-rows as specialized metadata records (all columns
        * meta-prefixed; sinks skip them as data).
        */
      preRecords: Option[DataFrame],
      /** (query filename, compiled SQL) per execution — the dry-run
        * surface (source.go:200-209 logs these instead of running).
        */
      compiled: Seq[(String, String)]) {
    /** Single-stream view (the reference pipes pre-records and data
      * through one channel; Meta.splitSpecializedMetadata re-separates).
      */
    def merged: Option[DataFrame] = (data, preRecords) match {
      case (Some(d), Some(p)) => Some(d.unionByName(p, allowMissingColumns = true))
      case (d, p) => d.orElse(p)
    }
  }

  /** Read query file(s): a single file, or every file in a directory
    * (source.go:290-320). Hadoop FS, so any supported scheme works.
    */
  def readQueryFiles(spark: SparkSession, path: String): Seq[(String, String)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath).sortBy(_.getName)
      else Seq(p)
    files.map { f =>
      val in = fs.open(f)
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, conf, false)
        f.getName -> out.toString("UTF-8")
      } finally in.close()
    }
  }

  def run(spark: SparkSession, spec: Spec, dryRun: Boolean = false): Out = {
    // 1. pre-query → prefixed pre-row maps (+ filename column)
    val preDf: Option[DataFrame] =
      if (spec.preQuery.trim.isEmpty || dryRun) None
      else SqlScript.run(spark, spec.preQuery, dryRun = false)
    val preRows: Seq[Map[String, Any]] = preDf match {
      case Some(df) =>
        val cols = df.columns
        val collected = df.limit(spec.maxPreRows + 1).collect().toSeq
        require(
          collected.size <= spec.maxPreRows,
          s"pre-query returned more than maxPreRows=${spec.maxPreRows} rows; " +
            "pre-rows are control-plane (one query per pre-row × file) — " +
            "raise Spec.maxPreRows only if the query fan-out is intended")
        collected.map { row =>
          cols.zipWithIndex.map { case (c, i) =>
            (spec.metadataPrefix + c) -> row.get(i)
          }.toMap + (spec.filenameColumn -> spec.preQueryFilename)
        }
      case None => Seq(Map(spec.filenameColumn -> spec.preQueryFilename))
    }
    // pre-row field types, for typed literals on the merge (a bare
    // lit(null) would give the merged column NullType, which breaks
    // downstream parquet/union consumers)
    val preTypes: Map[String, org.apache.spark.sql.types.DataType] =
      preDf.map(_.schema.fields.map(f =>
        (spec.metadataPrefix + f.name) -> f.dataType).toMap).getOrElse(Map.empty)

    // 2. per (pre-row, file): compile + (unless dry-run) execute
    val compiled = for {
      pre <- preRows
      (fname, raw) <- spec.queryFiles
    } yield (pre, fname, Template.render(raw, pre))

    val frames: Seq[DataFrame] =
      if (dryRun) Nil
      else compiled.flatMap { case (pre, fname, sql) =>
        SqlScript.run(spark, sql, dryRun = false).map { res0 =>
          val res = if (spec.stampTotalCount) Meta.withRecordTotalCount(res0) else res0
          // merge pre-row fields the record lacks (record wins,
          // source.go:226-230); filename column overrides (source.go:232)
          val have = res.columns.map(_.toLowerCase).toSet
          val extra: Seq[Column] = pre.toSeq.sortBy(_._1).collect {
            case (k, v) if k != spec.filenameColumn && !have.contains(k.toLowerCase) =>
              preTypes.get(k) match {
                case Some(dt) => lit(v).cast(dt).as(k)
                case None => lit(v).as(k)
              }
          }
          res.select(
            (res.columns.filterNot(_ == spec.filenameColumn).map(c => col(s"`$c`")).toSeq
              ++ extra :+ lit(fname).as(spec.filenameColumn)): _*)
        }
      }

    val data = frames.reduceOption(_.unionByName(_, allowMissingColumns = true))

    // 3. pre-rows as specialized metadata records (source.go:176)
    val preRecords = preDf.map { df =>
      Meta.withMetadataPrefix(df, spec.metadataPrefix)
        .withColumn(spec.filenameColumn, lit(spec.preQueryFilename))
    }

    Out(data, preRecords, compiled.map { case (_, f, q) => (f, q) })
  }
}
