package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for test suites — one session per suite,
  * isolated warehouse/metastore dirs so saveAsTable tests don't clash.
  */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  private val tmp = java.nio.file.Files.createTempDirectory("graft-test").toString

  lazy val spark: SparkSession = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir", s"$tmp/warehouse")
    .config("javax.jdo.option.ConnectionURL",
      s"jdbc:derby:;databaseName=$tmp/metastore_db;create=true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("WARN") }

  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  override def afterAll(): Unit = {
    // deliberately keep the session (shared JVM across suites in sbt)
    super.afterAll()
  }
}
