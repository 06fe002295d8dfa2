package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew handling for joins: when one key dominates the fact side, a plain
  * shuffle join lands the whole hot key on one task. Salting splits the hot
  * key across S sub-keys (fact gets a deterministic salt, the dim is
  * replicated S ways) so the hot partition parallelizes S-fold. This spec
  * pins the technique's correctness: the salted join must produce exactly
  * the plain join's result on a 90%-hot-key dataset.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val S = 16 // salt fan-out

  test("salted join equals plain join on a 90% hot-key fact table") {
    import spark.implicits._
    // 50k facts, 90% on key 0, the rest uniform over 1..999
    val fact = spark.range(50000).toDF("row_id")
      .withColumn("key", when(pmod(col("row_id"), lit(10)) < 9, lit(0L))
        .otherwise(pmod(col("row_id"), lit(999)) + 1))
      .withColumn("v", col("row_id") * 3 % 97)
    val dim = spark.range(1000).toDF("key").withColumn("name", concat(lit("k"), col("key")))

    val plain = fact.join(dim, "key")
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))

    // deterministic salt from row identity; dim replicated S ways
    val saltedFact = fact.withColumn("salt", pmod(col("row_id"), lit(S)))
    val saltedDim = dim.withColumn("salt", explode(array((0 until S).map(lit): _*)))
    val salted = saltedFact.join(saltedDim, Seq("key", "salt"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))

    val p = plain.orderBy("name").as[(String, Long, Long)].collect().toSeq
    val q = salted.orderBy("name").as[(String, Long, Long)].collect().toSeq
    assert(p === q)
    assert(p.map(_._2).sum === 50000) // every fact row joined exactly once
  }
}
