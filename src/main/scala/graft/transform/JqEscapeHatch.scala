package graft.transform

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}

import org.apache.spark.sql.{DataFrame, Dataset}

/** Full-jq escape hatch (SURVEY §7.3): for programs outside the
  * [[Jq]] compiler's subset, run the real `jq -c` binary over NDJSON —
  * the reference's exact execution model (ext/jq/connector.go:101-127),
  * but per PARTITION instead of per 512-record batch, so the
  * subprocess cost is paid once per task and the work distributes.
  *
  * Semantics are jq's own: each input record may produce 0..N output
  * records (UDTF-shaped), arbitrary restructuring allowed. Output is
  * re-parsed with schema inference (union of keys), like every NDJSON
  * boundary in the reference.
  *
  * Scale note: one jq process per task; records stream through
  * stdin/stdout with a pump thread (no buffering of the whole
  * partition). CPU-bound single-threaded per task — parallelism comes
  * from partition count, same as the reference's CONCURRENCY knob.
  */
object JqEscapeHatch {

  /** Validate the program's syntax ONCE on the driver (jq exits 3 on a
    * compile error) so a bad program fails fast with jq's own message
    * instead of an empty-output schema error from the distributed run.
    */
  def validate(program: String): Unit = {
    val proc = new ProcessBuilder("jq", "-c", program).start()
    proc.getOutputStream.close()
    val err = new String(proc.getErrorStream.readAllBytes(), "UTF-8")
    if (proc.waitFor() != 0)
      throw new IllegalArgumentException(s"invalid jq program: ${err.trim}")
  }

  /** Apply `program` to every row; returns the NDJSON output lines. */
  def rawApply(ndjson: Dataset[String], program: String): Dataset[String] = {
    import ndjson.sparkSession.implicits._
    ndjson.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val proc = new ProcessBuilder("jq", "-c", program)
          .redirectErrorStream(false).start()
        val out = new BufferedWriter(
          new OutputStreamWriter(proc.getOutputStream, "UTF-8"), 1 << 16)
        val in = new BufferedReader(
          new InputStreamReader(proc.getInputStream, "UTF-8"), 1 << 16)
        // pump stdin on a side thread so stdout can't deadlock the task
        val pump = new Thread(() => {
          try {
            rows.foreach { r => out.write(r); out.write('\n') }
            out.close()
          } catch { case _: java.io.IOException => () /* jq exited early */ }
        }, "jq-stdin-pump")
        pump.setDaemon(true)
        pump.start()
        new Iterator[String] {
          private var nextLine: String = in.readLine()
          def hasNext: Boolean = {
            if (nextLine == null) { in.close(); proc.waitFor() }
            nextLine != null
          }
          def next(): String = {
            val l = nextLine; nextLine = in.readLine(); l
          }
        }
      }
    }
  }

  /** DataFrame → jq → DataFrame (schema re-inferred from the output). */
  def apply(df: DataFrame, program: String): DataFrame = {
    validate(program)
    val spark = df.sparkSession
    spark.read.json(rawApply(df.toJSON, program))
  }
}
