package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE's runtime re-plan is the other half of the skew story (SkewJoinSpec
  * covers manual salting): with skew-join handling on, a sort-merge join
  * whose one partition dwarfs the rest gets split at RUNTIME into subtasks.
  * Thresholds are lowered so the fixture-scale data trips the optimization;
  * the assertion is the `skew=true` marker in the final adaptive plan plus
  * result correctness.
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k fact rows, 95% on one key; pad makes the hot partition big
      val fact = spark.range(200000).toDF("id")
        .withColumn("key", when(pmod(col("id"), lit(20)) < 19, lit(7L))
          .otherwise(pmod(col("id"), lit(1000))))
        .withColumn("pad", lpad(col("id").cast("string"), 64, "x"))
      val dim = spark.range(1000).toDF("key")
        .withColumn("name", concat(lit("k"), col("key")))
      val joined = fact.join(dim, "key").groupBy("name").agg(count(lit(1)).as("n"))
      val rows = joined.collect() // force: AQE decisions happen at runtime
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew-join split in final plan:\n$plan")
      assert(rows.map(_.getLong(1)).sum === 200000)
      assert(rows.find(_.getString(0) == "k7").get.getLong(1) === 190000L)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
