package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Quality}

/** Property tests for the invariants SURVEY §5.2 pins: dedup
  * idempotence, avg ignoring nulls, clean-policy containment,
  * union-append equivalence. Inputs are seeded random datasets
  * (deterministic across runs).
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def randomRows(seed: Int, n: Int = 60): List[(Int, Option[Double])] = {
    val r = new scala.util.Random(seed)
    List.fill(n)((r.nextInt(10),
      if (r.nextBoolean()) Some(r.nextDouble() * 200 - 100) else None))
  }

  test("keepFirst is idempotent: dedup(dedup(x)) == dedup(x)") {
    for (seed <- 1 to 8) {
      val data = randomRows(seed)
      val df = data.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }.toDF("k", "v", "ord")
      val once = Dedup.keepFirst(df, Seq("k"), Seq(col("ord")))
      val twice = Dedup.keepFirst(once, Seq("k"), Seq(col("ord")))
      assert(once.collect().sortBy(_.getLong(2)).toSeq === twice.collect().sortBy(_.getLong(2)).toSeq)
    }
  }

  test("avg ignores nulls: avg(xs ++ nulls) == avg(xs)") {
    for (seed <- 1 to 8) {
      val data = randomRows(seed)
      val present = data.flatMap(_._2)
      val a = data.map(_._2).toDF("v").agg(avg($"v")).collect()(0).getDouble(0)
      val b = present.toDF("v").agg(avg($"v")).collect()(0).getDouble(0)
      assert(math.abs(a - b) < 1e-9)
    }
  }

  test("clean policies nest: DropIfAnyNull ⊆ DropIfAllNull ⊆ KeepAll") {
    for (seed <- 1 to 8) {
      val df = randomRows(seed).map { case (k, v) =>
        (v, if (k % 3 == 0) None else Some(k.toDouble))
      }.toDF("a", "b")
      val strict = Quality.clean(df, Seq("a", "b"), Quality.DropIfAnyNull).count()
      val loose = Quality.clean(df, Seq("a", "b"), Quality.DropIfAllNull).count()
      val all = Quality.clean(df, Seq("a", "b"), Quality.KeepAll).count()
      assert(strict <= loose && loose <= all && all === 60L)
    }
  }

  test("append-then-dedup == union-then-dedup (storage is the union operator)") {
    for (seed <- 1 to 8) {
      val d1 = randomRows(seed)
      val d2 = randomRows(seed + 100)
      val a = d1.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }.toDF("k", "v", "ord")
      val b = d2.zipWithIndex.map { case ((k, v), i) => (k, v, (i + d1.size).toLong) }.toDF("k", "v", "ord")
      val viaUnion = Dedup.keepFirst(a.union(b), Seq("k"), Seq(col("ord"))).count()
      val expectedKeys = (d1 ++ d2).map(_._1).distinct.size.toLong
      assert(viaUnion === expectedKeys)
    }
  }
}
