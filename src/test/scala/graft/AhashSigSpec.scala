package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.AhashSig

/** The native codegen'd aHash-signature expression must agree exactly with
  * (a) a reference JVM implementation of the documented bit rule and (b)
  * the Catalyst higher-order-function fold it replaced — and it must
  * evaluate inside codegen without falling back.
  */
class AhashSigSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def jvmSig(bytes: Array[Byte]): Long = {
    if (bytes.length < 2) return 0L
    val lenM1 = (bytes.length - 1).toLong
    val samples = (0 until 64).map(i => bytes((i * lenM1 / 63).toInt) & 0xff)
    val ssum = samples.map(_.toLong).sum
    samples.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
      if (x.toLong * 64L > ssum) acc | (1L << (63 - i)) else acc
    }
  }

  /** The pre-native formulation: three higher-order array expressions. */
  private val hofSig = expr(
    "aggregate(zip_with(" +
      "transform(sequence(0, 63), i -> CAST(conv(hex(substring(payload, " +
      "CAST(CAST(i AS BIGINT) * (length(payload) - 1) DIV 63 AS INT) + 1, " +
      "1)), 16, 10) AS BIGINT)), sequence(0, 63), (x, i) -> IF(x * 64 > " +
      "aggregate(transform(sequence(0, 63), j -> CAST(conv(hex(substring(" +
      "payload, CAST(CAST(j AS BIGINT) * (length(payload) - 1) DIV 63 AS " +
      "INT) + 1, 1)), 16, 10) AS BIGINT)), 0L, (a, y) -> a + y), " +
      "shiftleft(1L, 63 - CAST(i AS INT)), 0L)), 0L, (a, b) -> a | b)")

  test("native expression equals JVM reference and HOF fold on fixture documents") {
    import spark.implicits._
    AhashSig.register(spark)
    val rows = Tables.documents(spark, TestSpark.sfDir)
      .select(col("text").cast("binary").as("payload"))
      .filter(length(col("payload")) >= 64)
      .select(col("payload"), expr("ahash_sig(payload)").as("native"), hofSig.as("hof"))
      .as[(Array[Byte], Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (payload, native, hof) =>
      assert(native === jvmSig(payload))
      assert(native === hof)
    }
  }

  test("native expression matches reference on arbitrary byte arrays") {
    import spark.implicits._
    AhashSig.register(spark)
    val gen = Gen.choose(2, 300).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    val prop = Prop.forAll(Gen.listOfN(15, gen)) { arrs =>
      val got = arrs.zipWithIndex.map { case (a, i) => (i.toLong, a) }
        .toDS().toDF("id", "payload")
        .select(col("id"), expr("ahash_sig(payload)").as("sig"))
        .orderBy("id").as[(Long, Long)].collect().map(_._2)
      got.toSeq == arrs.map(jvmSig)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("expression runs inside WholeStageCodegen (no fallback)") {
    AhashSig.register(spark)
    val plan = Tables.documents(spark, TestSpark.sfDir)
      .select(expr("ahash_sig(CAST(text AS BINARY))"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("ahash_sig") && l.trim.startsWith("*(")), plan)
  }
}
