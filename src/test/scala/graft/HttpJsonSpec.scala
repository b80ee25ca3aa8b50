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

  test("transport failure surfaces as a task error, not silent data loss") {
    val ex = intercept[Exception] {
      HttpJson.read(spark, Seq("/nonexistent/payload.json"), Pollutants,
        transport = HttpJson.fileTransport).count()
    }
    assert(ex.getMessage != null)
  }
}
