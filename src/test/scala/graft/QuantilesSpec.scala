package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Quantiles

/** Quantiles.exact must reproduce Spark's exact `percentile` aggregate —
  * same interpolation arithmetic, same tie handling — on every data shape
  * the battery serves it: grouped and global, integers and doubles, heavy
  * ties (the lo==hi FP-identity case), singleton and two-row groups, and
  * skewed group sizes. The comparison is EXACT double equality, not a
  * tolerance: the module's contract is bit-parity with the aggregate it
  * replaces (that is what keeps every oracle untouched).
  */
class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def compare(df: DataFrame, groupCols: Seq[String], v: String,
                      ps: Seq[(String, Double)]): Unit = {
    import scala.jdk.CollectionConverters._
    val mine = Quantiles.exact(df, groupCols, v, ps)
    val aggs = ps.map { case (n, p) =>
      expr(s"percentile(cast($v as double), ${p.toString})").as(n)
    }
    val ref =
      if (groupCols.isEmpty) df.filter(col(v).isNotNull).agg(aggs.head, aggs.tail: _*)
      else df.filter(col(v).isNotNull)
        .groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val key = (r: org.apache.spark.sql.Row) =>
      groupCols.indices.map(r.get(_).toString).mkString("|")
    val mineRows = mine.collectAsList().asScala.map(r => key(r) -> r).toMap
    val refRows = ref.collectAsList().asScala.map(r => key(r) -> r).toMap
    assert(mineRows.keySet === refRows.keySet)
    for ((k, rr) <- refRows; mr = mineRows(k); i <- ps.indices) {
      val c = groupCols.size + i
      assert(java.lang.Double.compare(mr.getDouble(c), rr.getDouble(c)) == 0,
        s"group=$k q=${ps(i)._1}: mine=${mr.getDouble(c)} ref=${rr.getDouble(c)}")
    }
  }

  private val ps5 = Seq("c1" -> 0.2, "c2" -> 0.4, "c3" -> 0.6, "c4" -> 0.8)
  private val terciles =
    Seq("q33" -> 0.3333333333333333, "q66" -> 0.6666666666666666)
  private val tails = Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99)

  test("grouped, near-unique integer domain (deterministic pseudo-random)") {
    val df = spark.range(0, 5000)
      .select((col("id") % 7).cast("string").as("g"),
        pmod(xxhash64(col("id")), lit(1000000L)).as("v"))
    compare(df, Seq("g"), "v", tails)
  }

  test("global, doubles with duplicates and negatives") {
    val df = spark.range(0, 3000)
      .select((sin(col("id").cast("double")) * 100.0).as("v"))
      .union(spark.range(0, 500).select(lit(13.37).as("v"))) // fat tie block
    compare(df, Seq.empty, "v", terciles)
  }

  test("heavy ties: tiny distinct domain, lo==hi value identity") {
    // values in {0..4}: most interpolation targets straddle EQUAL values,
    // the case where naive w-weighted summation loses bit-parity
    val df = spark.range(0, 2000)
      .select((col("id") % 3).cast("string").as("g"), (col("id") % 5).as("v"))
    compare(df, Seq("g"), "v", ps5)
  }

  test("degenerate groups: singleton, pair, and all-equal") {
    val df = spark.createDataFrame(Seq(
      ("a", 42L), ("b", 1L), ("b", 100L),
      ("c", 7L), ("c", 7L), ("c", 7L), ("c", 7L))).toDF("g", "v")
    compare(df, Seq("g"), "v", ps5 ++ tails)
  }

  test("nulls are skipped like the percentile aggregate") {
    val df = spark.range(0, 100)
      .select((col("id") % 2).cast("string").as("g"),
        when(col("id") % 10 === 0, lit(null)).otherwise(col("id")).as("v"))
    compare(df, Seq("g"), "v", tails)
  }

  test("skewed group sizes: one group 100x the other") {
    val big = spark.range(0, 10000)
      .select(lit("big").as("g"), pmod(xxhash64(col("id")), lit(999983L)).as("v"))
    val small = spark.range(0, 100)
      .select(lit("small").as("g"), col("id").as("v"))
    compare(big.union(small), Seq("g"), "v", terciles)
  }
}
