package graft

import org.apache.spark.sql.functions._
import graft.sources.HttpJson
import graft.pipelines.AirQuality.Pollutants

class HttpJsonSpec extends SparkSuite {

  test("executor-side fetch + from_json + flatten, multiple payloads") {
    val urls = Seq(fixture("aq_clean_768h.json"), fixture("aq_with_nulls.json"))
    val df = HttpJson.read(spark, urls, Pollutants, transport = HttpJson.fileTransport)
    assert(df.count() === 768 + 100)
    assert(df.schema("time").dataType.typeName === "timestamp")
    // both payloads' rows arrive; flattening happened per-payload
    assert(df.filter(col("ozone").isNull).count() === 100)
  }

  test("withRetry recovers from transient failures, rethrows after budget") {
    HttpJsonSpec.flakyCalls.clear()
    val flaky: HttpJson.Transport = { url =>
      val n: Int = HttpJsonSpec.flakyCalls.merge(url, Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      if (n < 3) throw new RuntimeException(s"transient #$n") else s"ok:$url"
    }
    val wrapped = HttpJson.withRetry(flaky, attempts = 3, backoffMs = 1)
    assert(wrapped("u1") === "ok:u1")            // succeeds on attempt 3
    HttpJsonSpec.flakyCalls.clear()
    val tight = HttpJson.withRetry(flaky, attempts = 2, backoffMs = 1)
    val e = intercept[RuntimeException] { tight("u2") }
    assert(e.getMessage.startsWith("transient")) // budget exhausted → original error
  }

  test("transport failure surfaces as a task error, not silent data loss") {
    val ex = intercept[Exception] {
      HttpJson.read(spark, Seq("/nonexistent/payload.json"), Pollutants,
        transport = HttpJson.fileTransport).count()
    }
    assert(ex.getMessage != null)
  }
}

object HttpJsonSpec {
  // Shared mutable call counter for the flaky-transport test (local
  // mode: tasks share the JVM, so this observes executor-side calls).
  val flakyCalls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
}
