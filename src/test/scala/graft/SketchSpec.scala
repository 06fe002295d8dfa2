package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Relational, Streamish}

/** Hard gate for the sketch path: `q_approx_distinct` is declared rows-only
  * (HLL estimates are engine-specific, so no DuckDB hash oracle), so this
  * spec asserts the accuracy contract instead — the self-reported relative
  * error of approx_count_distinct(rsd = 0.02) must stay within 2.5× the
  * requested rsd (HLL++ rsd is a standard deviation, not a hard bound;
  * 2.5 σ keeps the gate tight without flaking on sketch variance).
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def assertBound(dir: String): Unit = {
    val rows = Relational.approxDistinctDetail(spark, dir)
      .select("o_orderpriority", "rel_err").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = r.getDouble(1)
      assert(err <= 0.05, s"group ${r.getString(0)}: rel_err $err > 0.05")
    }
  }

  test("approx_count_distinct rel_err within 2.5x rsd at sf0.001") {
    assertBound(TestSpark.sfDir)
  }

  test("approx_count_distinct rel_err within 2.5x rsd at sf0.01") {
    assertBound("/root/testdata/sf0.01")
  }

  private def assertPctBound(dir: String): Unit = {
    // accuracy=1000 bounds rank error at n/1000 per group; on these group
    // sizes a 2% value-space tolerance is comfortably above that and still
    // catches a broken sketch outright
    val rows = Relational.approxPercentilesDetail(spark, dir)
      .select("o_orderpriority", "rel_err_p50", "rel_err_p95").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) <= 0.02, s"${r.getString(0)}: p50 err ${r.getDouble(1)}")
      assert(r.getDouble(2) <= 0.02, s"${r.getString(0)}: p95 err ${r.getDouble(2)}")
    }
  }

  test("approx_percentile rel_err within 2% at sf0.001") {
    assertPctBound(TestSpark.sfDir)
  }

  test("approx_percentile rel_err within 2% at sf0.01") {
    assertPctBound("/root/testdata/sf0.01")
  }

  private def assertCmsBound(dir: String): Unit = {
    // CMS contract: never underestimates; overshoot ≤ 2·(e/w)·N (the gate's
    // doubled Markov bound — deterministic for fixed seeds and data)
    val rows = Relational.approxTopKDetail(spark, dir)
      .select("l_partkey", "cnt_exact", "est", "n_total").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (key, exact, est, n) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"CMS underestimated key $key: $est < $exact")
      assert(est - exact <= 2.0 * math.E / 4096 * n,
        s"key $key overshoot ${est - exact} breaks the (2e/w)·N bound")
    }
  }

  test("count-min top-k within its overshoot bound at sf0.001") {
    assertCmsBound(TestSpark.sfDir)
  }

  test("count-min top-k within its overshoot bound at sf0.01") {
    assertCmsBound("/root/testdata/sf0.01")
  }

  test("driver-facing queries encode the tolerance verdict as within_tol = 1") {
    // the oracle emits a literal 1, so these columns ARE the driver's
    // quantitative sketch gate — a sketch outside its bound flips them to
    // 0 and the hash compare goes red
    val d = Relational.approxDistinct(spark, TestSpark.sfDir)
      .select("within_tol").collect().map(_.getLong(0))
    assert(d.nonEmpty && d.forall(_ == 1L))
    val p = Relational.approxPercentiles(spark, TestSpark.sfDir)
      .select("within_tol").collect().map(_.getLong(0))
    assert(p.nonEmpty && p.forall(_ == 1L))
    val t = Relational.approxTopK(spark, TestSpark.sfDir)
      .select("within_tol").collect().map(_.getLong(0))
    assert(t.nonEmpty && t.forall(_ == 1L))
    val i = Relational.approxIntersect(spark, TestSpark.sfDir)
      .select("within_tol").collect().map(_.getLong(0))
    assert(i.nonEmpty && i.forall(_ == 1L))
    val pr = Relational.profile(spark, TestSpark.sfDir)
      .select("within_tol").collect().map(_.getLong(0))
    assert(pr.nonEmpty && pr.forall(_ == 1L))
    val h = Streamish.hllMerge(spark, TestSpark.sfDir)
      .select("within_tol").collect().map(_.getLong(0))
    assert(h.nonEmpty && h.forall(_ == 1L))
  }

  test("q_profile statistics are the known fixture facts") {
    val rows = Relational.profile(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r).toMap
    val rf = rows("l_returnflag")
    assert(rf.getLong(2) == 0L, "n_null")       // parquet column is dense
    assert(rf.getLong(3) == 3L, "n_distinct")   // A / N / R
    assert(rf.getString(4) == "A" && rf.getString(5) == "R")
    val sd = rows("l_shipdate")
    // DATE-truncated string extremes, identical to DuckDB's ::DATE::VARCHAR
    assert(sd.getString(4).matches("\\d{4}-\\d{2}-\\d{2}"))
    assert(rows.keySet.size == 6 && rows.values.forall(_.getLong(1) > 0))
  }

  test("ev_hll_merge: merged weekly sketch agrees with exact at sparse scale") {
    // at these per-group cardinalities the lgK=12 sketch is in sparse-exact
    // mode, so merge-then-estimate must land well inside the 5% gate on
    // every (type, week) — a broken union would miss immediately
    val rows = Streamish.hllMerge(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length > 10)
    assert(rows.forall(_.getLong(3) == 1L))
  }

  private def assertIntersectBound(dir: String): Unit = {
    // inclusion-exclusion compounds three sketches; each within 2.5x its 2%
    // rsd bounds the signed sum by 0.05 * (|A| + |B| + |A u B|)
    val rows = Relational.approxIntersectDetail(spark, dir)
      .select("y", "overlap_exact", "est", "n_a", "n_b").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      val union = r.getLong(3) + r.getLong(4) - exact
      val budget = 0.05 * (r.getLong(3) + r.getLong(4) + union)
      assert(math.abs(est - exact) <= budget,
        s"year ${r.getLong(0)}: |$est - $exact| > $budget")
    }
  }

  test("inclusion-exclusion overlap within its compounded bound at sf0.001") {
    assertIntersectBound(TestSpark.sfDir)
  }

  test("inclusion-exclusion overlap within its compounded bound at sf0.01") {
    assertIntersectBound("/root/testdata/sf0.01")
  }
}
