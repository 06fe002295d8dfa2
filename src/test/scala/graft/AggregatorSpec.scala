package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.udf.NumProfileAgg

/** The typed Aggregator must agree with the built-in aggregates, through
  * both the typed (`KeyValueGroupedDataset.agg`) and the registered-UDAF
  * (untyped SQL) paths, and its plan must show a partial/final split.
  */
class AggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("typed path matches built-in count/sum/min/max per group") {
    import spark.implicits._
    val typed = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_totalprice"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(NumProfileAgg.toColumn.name("p"))
      .collect().toMap
    val builtin = Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"),
        min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(typed.keySet === builtin.keySet)
    typed.foreach { case (k, p) =>
      val (n, s, mn, mx) = builtin(k)
      assert(p.n === n)
      assert(math.abs(p.sum - s) / s < 1e-9) // reduction order may differ
      assert(p.min === mn && p.max === mx)
    }
  }

  test("registered as a UDAF, usable from SQL, with partial aggregation in the plan") {
    spark.udf.register("num_profile", udaf(NumProfileAgg))
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    val df = spark.sql(
      "SELECT o_orderpriority, num_profile(o_totalprice).n AS n FROM orders_v GROUP BY 1")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_num_profile") || plan.contains("partial_numprofile")
      || plan.toLowerCase.contains("partial"), plan) // map-side partial agg present
    val n = df.collect().map(r => r.getLong(1)).sum
    assert(n === Tables.orders(spark, dir).count())
  }
}
