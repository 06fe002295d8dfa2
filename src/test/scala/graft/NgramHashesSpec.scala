package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.NgramHashes

/** The native codegen'd windowed n-gram hasher must agree exactly with a
  * reference JVM implementation, stay injective-in-practice on the fixture
  * (no observed gram collisions), and evaluate inside codegen without
  * falling back.
  */
class NgramHashesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def jvmGrams(s: String, n: Int): Seq[Long] = {
    val bytes = s.getBytes("UTF-8")
    (0 to bytes.length - n).map { i =>
      var h1 = 0L
      var h2 = 0L
      (0 until n).foreach { j =>
        val b = bytes(i + j) & 0xff
        h1 = (h1 * NgramHashes.DefaultBase1 + b) % NgramHashes.DefaultMod
        h2 = (h2 * NgramHashes.DefaultBase2 + b) % NgramHashes.DefaultMod
      }
      h1 * 2147483648L + h2
    }
  }

  test("native expression equals the JVM reference on fixture documents") {
    import spark.implicits._
    NgramHashes.register(spark)
    val rows = Tables.documents(spark, TestSpark.sfDir)
      .select(lower(col("text")).as("t"),
        expr("ngram_hashes(lower(text), 4)").as("native"))
      .as[(String, Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, native) => assert(native === jvmGrams(t, 4)) }
  }

  test("hash interning is collision-free across the fixture's distinct grams") {
    import spark.implicits._
    val grams = Tables.documents(spark, TestSpark.sfDir)
      .select(lower(col("text")).as("t")).as[String].collect()
      .flatMap(t => t.sliding(4).toSeq.zip(jvmGrams(t, 4)))
    assert(grams.nonEmpty)
    val byHash = grams.groupBy(_._2).values
    assert(byHash.forall(g => g.map(_._1).distinct.length == 1),
      "two distinct grams shared a hash")
  }

  test("native expression matches reference on arbitrary ASCII strings") {
    import spark.implicits._
    NgramHashes.register(spark)
    val gen = Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)
    val prop = Prop.forAll(Gen.listOfN(20, gen)) { strs =>
      val got = strs.toDS().select(expr("ngram_hashes(value, 3)"))
        .as[Seq[Long]].collect()
      got.toSeq == strs.map(jvmGrams(_, 3))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("expression runs inside WholeStageCodegen (no fallback)") {
    NgramHashes.register(spark)
    val plan = Tables.documents(spark, TestSpark.sfDir)
      .select(expr("ngram_hashes(text, 4)"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("ngram_hashes") && l.trim.startsWith("*(")), plan)
  }
}
