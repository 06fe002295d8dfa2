package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.RollingHash

/** The native codegen'd rolling-hash expression must agree exactly with (a)
  * a reference JVM implementation and (b) the equivalent Catalyst
  * higher-order-function fold — and it must evaluate inside codegen without
  * falling back.
  */
class RollingHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def jvmHash(s: String): Long = {
    var h = 0L
    for (b <- s.getBytes("UTF-8")) h = (h * RollingHash.DefaultBase + (b & 0xff)) % RollingHash.DefaultMod
    h
  }

  test("native expression equals JVM reference and HOF fold on fixture documents") {
    import spark.implicits._
    RollingHash.register(spark)
    val hofFold = {
      val tx = lower(col("text"))
      val codes = transform(sequence(lit(1), length(tx)),
        i => ascii(substr(tx, i, lit(1))).cast("long"))
      when(length(tx) === 0, lit(0L)).otherwise(
        aggregate(codes, lit(0L),
          (acc, c) => pmod(acc * lit(RollingHash.DefaultBase) + c, lit(RollingHash.DefaultMod))))
    }
    val rows = Tables.documents(spark, TestSpark.sfDir)
      .select(lower(col("text")).as("t"),
        expr("rolling_hash(lower(text))").as("native"), hofFold.as("hof"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, native, hof) =>
      assert(native === jvmHash(t))
      assert(native === hof) // ASCII fixture: byte loop == per-char fold
    }
  }

  test("native expression matches reference on arbitrary ASCII strings") {
    import spark.implicits._
    RollingHash.register(spark)
    val gen = Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)
    val prop = Prop.forAll(Gen.listOfN(20, gen)) { strs =>
      val got = strs.toDS().select(expr("rolling_hash(value)")).as[Long].collect()
      got.toSeq == strs.map(jvmHash)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("expression runs inside WholeStageCodegen (no fallback)") {
    RollingHash.register(spark)
    val plan = Tables.documents(spark, TestSpark.sfDir)
      .select(expr("rolling_hash(text)"))
      .queryExecution.executedPlan.toString
    // `*(n)` is the WholeStageCodegen stage marker; the projection computing
    // rolling_hash must carry it (a CodegenFallback expression would not).
    assert(plan.linesIterator.exists(l =>
      l.contains("rolling_hash") && l.trim.startsWith("*(")), plan)
  }
}
