package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.ArrayDot

/** The native codegen'd dot-product expression must agree exactly with the
  * higher-order `aggregate(zip_with(a, b, _*_), 0, _+_)` fold it replaces —
  * including null semantics (NULL array / NULL element / length mismatch →
  * NULL) — on both the BIGINT and DOUBLE paths, and it must evaluate inside
  * WholeStageCodegen without falling back.
  */
class ArrayDotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      zero: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), zero, (acc, x) => acc + x)

  test("long path equals HOF fold on fixture embeddings (dot and norm)") {
    import spark.implicits._
    ArrayDot.register(spark)
    val q = Tables.embeddings(spark, TestSpark.sfDir)
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * 1048576L)).as("vq"))
    val rows = q.as("a").join(q.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(200)
      .select(
        expr("array_dot(a.vq, b.vq)").as("native"),
        hofDot(col("a.vq"), col("b.vq"), lit(0L)).as("hof"),
        expr("array_dot(a.vq, a.vq)").as("native_n2"),
        hofDot(col("a.vq"), col("a.vq"), lit(0L)).as("hof_n2"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, h, nn, hn) => assert(n === h); assert(nn === hn) }
  }

  test("double path is bit-identical to the sequential HOF fold") {
    import spark.implicits._
    ArrayDot.register(spark)
    // Doubles whose sum is order-sensitive: bit-equality proves the native
    // loop reproduces the HOF's left-to-right IEEE accumulation.
    val gen = Gen.listOfN(64, Gen.choose(-1e6, 1e6))
    val prop = Prop.forAll(Gen.listOfN(5, Gen.zip(gen, gen))) { pairs =>
      val got = pairs.toDS().toDF("a", "b")
        .select(expr("array_dot(a, b)"),
          hofDot(col("a"), col("b"), lit(0.0)))
        .as[(Double, Double)].collect()
      got.forall { case (n, h) =>
        java.lang.Double.doubleToRawLongBits(n) == java.lang.Double.doubleToRawLongBits(h)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("null semantics mirror the HOF construction") {
    import spark.implicits._
    ArrayDot.register(spark)
    val df = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(3L, 4L))), // plain: 11
      (None, Some(Seq(3L, 4L))), // null array
      (Some(Seq(1L, 2L, 5L)), Some(Seq(3L, 4L))), // length mismatch
      (Some(Seq(1L, 2L)), Some(Seq(3L, 4L))) // control
    ).toDF("a", "b")
    val got = df.select(expr("array_dot(a, b)")).as[Option[Long]].collect()
    assert(got.toSeq === Seq(Some(11L), None, None, Some(11L)))
    // NULL element → NULL (built via array(lit(null)) since Seq[Option] encoders vary)
    val e = spark.range(1)
      .select(array(lit(1L), lit(null).cast("long")).as("a"), array(lit(2L), lit(3L)).as("b"))
      .select(expr("array_dot(a, b)")).as[Option[Long]].collect()
    assert(e.toSeq === Seq(None))
  }

  test("expression runs inside WholeStageCodegen (no fallback)") {
    ArrayDot.register(spark)
    val plan = Tables.embeddings(spark, TestSpark.sfDir)
      .select(transform(col("embedding").cast("array<double>"),
        x => floor(x * 1048576L)).as("vq"))
      .select(expr("array_dot(vq, vq)"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("array_dot") && l.trim.startsWith("*(")), plan)
  }
}
