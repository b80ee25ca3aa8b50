package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** HTTP JSON ingestion (SURVEY §2.1 S1) — the reference's
  * `requests.get(url).json()` re-expressed for scale.
  *
  * The reference fetches on the driver and pivots in Python; here the
  * URL list is a Dataset and the GET runs in `mapPartitions` on
  * executors, so ingesting 10⁶ payload URLs parallelizes like any
  * other scan. Parsing is `from_json` with an explicit schema and
  * flattening is the shared executor-side Generate (ColumnarJson).
  *
  * The transport is pluggable: `javaHttp` for production,
  * `fileTransport` (or any `String => String`) for offline tests —
  * the Spark plumbing is identical in both.
  */
object HttpJson {

  /** url → response body. Must be serializable (runs on executors). */
  type Transport = String => String

  /** Production transport: blocking GET with timeout + status check
    * (`First experiment/GPT 5.py:15-21` semantics: raise on non-2xx).
    */
  def javaHttp(timeoutSeconds: Long = 30): Transport = { url =>
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
      .header("User-Agent", "graft-engine/0.1").GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"HTTP ${resp.statusCode()} for $url")
    resp.body()
  }

  /** Wrap any transport with bounded retry + exponential backoff —
    * executor-side resilience for transient fetch failures. The
    * reference's answer to a failed GET is re-running the notebook
    * cell; an engine retries inside the task so one flaky URL doesn't
    * fail a 10⁶-URL ingest stage.
    */
  def withRetry(transport: Transport, attempts: Int = 3,
                backoffMs: Long = 100): Transport = { url =>
    var out: String = null
    var done = false
    var last: Throwable = null
    var i = 0
    while (!done && i < attempts) {
      // NonFatal only: an InterruptedException is Spark cancelling the
      // task — retrying would delay the kill, not recover anything.
      try { out = transport(url); done = true }
      catch {
        case scala.util.control.NonFatal(e) =>
          last = e; i += 1
          if (i < attempts) Thread.sleep(backoffMs << (i - 1))
      }
    }
    if (!done) throw last
    if (out == null)
      throw new RuntimeException(s"transport returned null body for $url")
    out
  }

  /** Offline transport: treat the "url" as a local file path. */
  val fileTransport: Transport = { path =>
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Fetch many payload URLs into a flat hourly DataFrame. Fetching,
    * parsing, and flattening all run on executors; `parallelism`
    * bounds concurrent requests cluster-wide.
    */
  def read(spark: SparkSession, urls: Seq[String], metrics: Seq[String],
           transport: Transport = javaHttp(),
           policy: ColumnarJson.RaggedPolicy = ColumnarJson.PadToLongest,
           parallelism: Int = 8): DataFrame = {
    val bodies = spark.createDataset(urls)(Encoders.STRING)
      .repartition(math.min(parallelism, math.max(1, urls.size)))
      .map(transport)(Encoders.STRING)
    val raw = bodies
      .select(from_json(col("value"), ColumnarJson.payloadSchema(metrics)).as("p"))
      .select(col("p.latitude").as("latitude"), col("p.longitude").as("longitude"),
        col("p.timezone").as("timezone"), col("p.hourly").as("hourly"))
    ColumnarJson.flatten(raw, metrics, policy)
  }
}
