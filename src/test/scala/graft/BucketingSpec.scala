package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located join story for 100 TB: writing both fact and dimension
  * bucketed on the join key lets the sort-merge join read each bucket pair
  * directly — zero shuffle at query time. This spec materializes bucketed
  * copies of orders/customer and asserts the join plan has NO shuffle
  * exchange on either side.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join on the bucket key runs with no shuffle exchange") {
    val dir = TestSpark.sfDir
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    Tables.orders(spark, dir).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
    Tables.customer(spark, dir).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the ONLY exchange allowed is the one for the 5-group aggregate —
      // the join itself must consume bucket outputs directly
      val joinPart = plan.split("SortMergeJoin", 2)(1)
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"join inputs were shuffled:\n$plan")
      assert(joined.count() === 5) // mktsegments in the fixture
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
