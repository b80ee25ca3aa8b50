package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source for columnar "dict of parallel arrays" JSON payloads (the
  * Open-Meteo shape: `hourly: {time: [...], pm10: [...], ...}` —
  * reference: `First experiment/GPT 5 MINI.py:21-32`).
  *
  * The reference flattens this in driver Python, materializing the
  * whole payload on the driver and shipping rows through Py4J
  * (`First experiment/GPT 5.py:47-54`) — fatal at scale (SURVEY
  * §4.3.4). Here flattening is a Catalyst `Generate` node
  * (`arrays_zip` + `posexplode`) that runs on executors, so a
  * directory of millions of payload files parallelizes for free.
  *
  * Ragged-array handling reproduces all three reference policies
  * (SURVEY §2.1 S2): pad-to-longest, truncate-to-shortest, and
  * align-to-time-axis. Missing metric keys become typed-null columns
  * (`Third Experiment/Gpt 5 mini.py:105`).
  */
object ColumnarJson {

  /** How to reconcile parallel arrays of unequal length. */
  sealed trait RaggedPolicy
  /** Row count = longest array; short arrays padded with null (`First experiment/GPT 5.py:51-53`). */
  case object PadToLongest extends RaggedPolicy
  /** Row count = shortest array (`Third Experiment/GPT 5 nano.py:43-53`). */
  case object TruncateToShortest extends RaggedPolicy
  /** Row count = length of `time`; metrics padded/truncated to it (`First experiment/GPT 5 MINI.py:45-64`). */
  case object AlignToTime extends RaggedPolicy

  /** Read one-or-many columnar JSON payload files into a flat hourly
    * DataFrame: `time TIMESTAMP, <metric> DOUBLE ..., latitude,
    * longitude, timezone`.
    *
    * @param metrics expected metric keys; absent keys yield typed-null
    *                columns so downstream schemas stay fixed.
    */
  /** Payload schema for a given metric set (shared by the file and
    * HTTP paths, and usable with `from_json` on any string column).
    */
  def payloadSchema(metrics: Seq[String]): StructType = {
    val hourlySchema = StructType(
      StructField("time", ArrayType(StringType)) +:
        metrics.map(m => StructField(m, ArrayType(DoubleType))))
    StructType(Seq(
      StructField("latitude", DoubleType),
      StructField("longitude", DoubleType),
      StructField("timezone", StringType),
      StructField("hourly", hourlySchema)))
  }

  def read(spark: SparkSession, path: String, metrics: Seq[String],
           policy: RaggedPolicy = PadToLongest): DataFrame = {
    val raw = spark.read.option("multiLine", "true")
      .schema(payloadSchema(metrics)).json(path)
    flatten(raw, metrics, policy)
  }

  /** S2 dynamic form: discover the metric keys from the payload itself
    * (every `hourly.*` array except `time`), so an unexpected metric
    * key SURFACES as a column instead of silently vanishing — the
    * reference builds its schema from the JSON's own keys
    * (`Third Experiment/Claude Haiku 3.5.py:55-59`). Runs Spark's JSON
    * schema inference as a discovery pass; keys are returned sorted so
    * the output schema is deterministic regardless of file order.
    */
  def discoverMetrics(spark: SparkSession, path: String): Seq[String] = {
    val inferred = spark.read.option("multiLine", "true").json(path)
    inferred.schema.find(_.name == "hourly").map(_.dataType) match {
      case Some(st: StructType) =>
        // Only array-typed fields are metrics: a scalar annotation
        // (e.g. hourly.units: "ug/m3") force-read as array<double>
        // would become a silent all-null column — exactly the failure
        // this path exists to prevent. Non-array fields stay visible
        // through the inferred schema instead.
        st.fields.collect {
          case StructField(name, _: ArrayType, _, _) if name != "time" => name
        }.sorted.toSeq
      case _ => Seq.empty
    }
  }

  /** Read with payload-discovered metric keys (two passes over the
    * files: inference, then the typed read — the price of not trusting
    * a caller-supplied key list).
    */
  def readDynamic(spark: SparkSession, path: String,
                  policy: RaggedPolicy = PadToLongest): DataFrame =
    read(spark, path, discoverMetrics(spark, path), policy)

  /** Flatten a parsed payload DataFrame (one row per payload, `hourly`
    * struct-of-arrays) into one row per hour. Executor-side only.
    */
  def flatten(raw: DataFrame, metrics: Seq[String], policy: RaggedPolicy): DataFrame = {
    val timeArr = coalesce(col("hourly.time"), array().cast("array<string>"))
    val metricArr: Map[String, org.apache.spark.sql.Column] =
      metrics.map(m => m -> coalesce(col(s"hourly.$m"), array().cast("array<double>"))).toMap

    // arrays_zip pads to the longest input — the PadToLongest policy.
    // The other policies filter on the row position afterwards.
    val zipped = arrays_zip(
      (timeArr.as("time") +: metrics.map(m => metricArr(m).as(m))): _*)

    val limitExpr = policy match {
      case PadToLongest => greatest((size(timeArr) +: metrics.map(m => size(metricArr(m)))): _*)
      case TruncateToShortest => least((size(timeArr) +: metrics.map(m => size(metricArr(m)))): _*)
      case AlignToTime => size(timeArr)
    }

    raw
      .withColumn("__limit", limitExpr)
      .select(col("latitude"), col("longitude"), col("timezone"), col("__limit"),
        posexplode(zipped).as(Seq("__pos", "__row")))
      .filter(col("__pos") < col("__limit"))
      .select(
        (to_timestamp(col("__row.time"), "yyyy-MM-dd'T'HH:mm").as("time") +:
          metrics.map(m => col(s"__row.$m").as(m))) ++
          Seq(col("latitude"), col("longitude"), col("timezone")): _*)
  }
}
