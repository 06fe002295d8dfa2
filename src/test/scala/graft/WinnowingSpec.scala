package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/** Fixture tests for the two round-9 corpus-maintenance operators:
  * winnowing fingerprint selection (Schleimer/Wilkerson/Aiken SIGMOD'03;
  * K=5-token shingles, W=4 windows) and incremental batch-vs-snapshot
  * dedup. The synthetic corpus exercises engine parity; these pin the
  * algorithmic contracts on constructed inputs.
  */
class WinnowingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def winnowRows(rows: (Long, String)*) = {
    import spark.implicits._
    TextOps.winnowingOf(docs(rows: _*))
      .as[(Long, Long, Long, Double, Long)].collect().sortBy(_._1)
  }

  test("winnowing guarantee: docs sharing a run of >= W+K-1 tokens share a fingerprint hash") {
    import spark.implicits._
    // 8 shared tokens (= WinW + WinK - 1) at different offsets and with
    // different surrounding text — the SIGMOD'03 guarantee says at least one
    // selected fingerprint hash must coincide.
    val shared = "zebra quark lumen forge vex nimbus oryx pylon"
    val a = s"alpha beta $shared gamma delta epsilon"
    val b = s"one two three four $shared five"
    val sel = TextOps.winnowSelections(docs(1L -> a, 2L -> b))
      .select(col("doc_id"), shiftright(col("sel"), 21).as("h"))
      .as[(Long, Long)].collect()
    val ha = sel.filter(_._1 == 1L).map(_._2).toSet
    val hb = sel.filter(_._1 == 2L).map(_._2).toSet
    assert((ha intersect hb).nonEmpty,
      "shared 8-token run must yield a common winnowed fingerprint")
  }

  test("winnowing counts: all-identical tokens select one fingerprint per window (rightmost min)") {
    // 12 tokens -> 8 shingles, all hashing identically; every window's min
    // key is its rightmost shingle, so selections are positions W-1..n_sh-1:
    // n_fp = n_sh - W + 1 = 5.
    val r = winnowRows(1L -> Seq.fill(12)("same").mkString(" "))
    assert((r.head._1, r.head._2, r.head._3, r.head._4) === ((1L, 8L, 5L, 0.625)))
  }

  test("winnowing short-doc contract: >= 1 fingerprint whenever >= 1 shingle; zeros under K tokens") {
    val r = winnowRows(
      1L -> "a b c d e", //           exactly K tokens: 1 shingle
      2L -> "a b c d e f", //         2 shingles, still < W: one window
      3L -> "a b c d", //             under K tokens: zero row
      4L -> "")
    assert(r(0)._2 === 1L && r(0)._3 === 1L && r(0)._4 === 1.0)
    assert(r(1)._2 === 2L && r(1)._3 === 1L, "S < W docs winnow one truncated window")
    assert(r(2) === ((3L, 0L, 0L, 0.0, 0L)))
    assert(r(3) === ((4L, 0L, 0L, 0.0, 0L)))
  }

  test("winnowing density on a long all-distinct doc stays in the [1/W, 1] band") {
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val r = winnowRows(1L -> text).head
    assert(r._2 === 196L)
    assert(r._4 >= 0.25 && r._4 <= 1.0, s"density ${r._4} outside winnowing bounds")
  }

  test("containment catches a short doc embedded in a long one (the Jaccard-blind case)") {
    import spark.implicits._
    val embedded = "red oak pine elm birch maple cedar ash" // 8 tokens -> 4 shingles
    val long = ((1 to 60).map(i => s"filler$i") :+ embedded).mkString(" ")
    val unrelated = (1 to 30).map(i => s"other$i").mkString(" ")
    val got = Dedup.containmentOf(docs(1L -> embedded, 2L -> long, 3L -> unrelated))
      .select("doc_a", "doc_b", "inter", "containment")
      .as[(Long, Long, Long, Double)].collect()
    // doc 1's 4 shingles all appear in doc 2: containment = 4/4 = 1.0 even
    // though Jaccard is ~4/64 — the asymmetric signal. doc 3 pairs with no one.
    assert(got.toSeq === Seq((1L, 2L, 4L, 1.0)))
  }

  test("incremental dedup classifies dup_corpus / dup_batch / new, nulls deterministic") {
    import spark.implicits._
    val fixture = docs(
      0L -> "a b c", //   snapshot
      2L -> "d e f", //   snapshot
      4L -> "", //        snapshot (null fp — must not match batch empties)
      1L -> "a b c", //   fp in snapshot -> dup_corpus
      3L -> "x y z", //   unseen -> new
      5L -> "x y z", //   earlier batch twin -> dup_batch
      7L -> "", //        null fp: no corpus equality match -> new
      9L -> "") //        second null-fp batch doc -> dup_batch
    val got = Dedup.incrementalDedupOf(fixture)
      .select("doc_id", "status").as[(Long, String)].collect().sortBy(_._1)
    assert(got === Array(
      1L -> "dup_corpus", 3L -> "new", 5L -> "dup_batch",
      7L -> "new", 9L -> "dup_batch"))
  }

  test("neardup ingest adds the neardup_corpus tier between dup_batch and new") {
    import spark.implicits._
    // 40 distinct tokens -> 38 distinct 3-shingles; a single mid-doc token
    // swap changes exactly 3 of them: jac = 35/41 = 0.8537 >= 0.8
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearSnap = (1 to 40).map(i => if (i == 20) "swapx" else s"tok$i").mkString(" ")
    val other = (1 to 40).map(i => s"alt$i").mkString(" ")
    val nearBatch = (1 to 40).map(i => if (i == 20) "swapx" else s"alt$i").mkString(" ")
    val fixture = docs(
      0L -> base, //       snapshot
      1L -> base, //       exact fp in snapshot -> dup_corpus (beats its jac=1 near hit)
      3L -> nearSnap, //   1-token swap vs snapshot doc 0 -> neardup_corpus
      5L -> nearSnap, //   same text as batch doc 3 -> dup_batch (exact tier wins)
      7L -> other, //      unrelated to the snapshot -> new
      9L -> nearBatch) //  near-dup of BATCH doc 7 only -> new (in-batch near
    //                      dups are dd_neardup's job, not the ingest tier's)
    val got = Dedup.neardupIngestOf(fixture)
      .select("doc_id", "status", "best_jac")
      .as[(Long, String, Option[Double])].collect().sortBy(_._1)
    assert(got.map(r => r._1 -> r._2) === Array(
      1L -> "dup_corpus", 3L -> "neardup_corpus", 5L -> "dup_batch",
      7L -> "new", 9L -> "new"))
    // best_jac only on the neardup row, and exactly the hand-computed 35/41
    assert(got.map(_._3) === Array(None, Some(0.8537), None, None, None))
  }
}
