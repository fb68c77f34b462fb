package graft

import graft.util.{Metrics, Retry}

class MetricsSpec extends SparkSuite {
  import spark.implicits._

  test("observe rides the query: record count + bytes after one action (commonmetric.go)") {
    val df = Metrics.observe(
      Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v"),
      "test_source", withBytes = true)
    assert(df.count() == 3)
    // listener delivery is asynchronous on job end
    var tries = 0
    while (Metrics.lastObserved("test_source").isEmpty && tries < 50) {
      Thread.sleep(100); tries += 1
    }
    val m = Metrics.lastObserved("test_source")
    assert(m("record_count") == 3L)
    assert(m("record_bytes") > 0L)
  }

  test("pipeline runs carry the observation (registry integration)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_metrics")
    Seq(Tuple1(1L), Tuple1(2L)).toDF("id").write.mode("overwrite").json(s"$dir/in.json")
    graft.pipeline.Pipeline.run(spark, graft.pipeline.Pipeline.Spec(
      from = "FILE", to = Seq("FILE"),
      env = Map(
        "FILE__SOURCE_URI" -> s"$dir/in.json",
        "FILE__DESTINATION_URI" -> s"$dir/out.json")))
    var tries = 0
    while (Metrics.lastObserved("pipeline").isEmpty && tries < 50) {
      Thread.sleep(100); tries += 1
    }
    assert(Metrics.lastObserved("pipeline")("record_count") == 2L)
  }

  test("component counters: retry count and timed duration") {
    val comp = new Metrics.Component(spark, "test_comp")
    var calls = 0
    val out = comp.retry(maxAttempts = 3, backoffMs = 1L) {
      calls += 1
      if (calls < 3) sys.error("flaky")
      "ok"
    }
    assert(out == "ok")
    assert(comp.retryCount.value == 2L) // two failed attempts before success
    comp.timed { Thread.sleep(5) }
    assert(comp.processDurationMs.value >= 5L)
  }

  test("Retry onRetry hook fires per failed attempt") {
    var hooks = 0
    intercept[RuntimeException] {
      Retry(maxAttempts = 3, backoffMs = 1L, onRetry = () => hooks += 1) {
        sys.error("always")
      }
    }
    assert(hooks == 2) // last attempt rethrows without a retry
  }
}
