package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** Pins the iterative operators' cache discipline: a query that persists
  * intermediates must release every superseded frame before it returns, so
  * running it leaks nothing into the session's cache beyond its own
  * materialized result. At a 100× node set, RankIters stale rank vectors
  * plus the pinned edge frame is real executor memory; this spec makes the
  * leak a test failure instead of a slow-cluster mystery.
  *
  * (build.sbt forks tests and testForkedParallel is off, so suites run
  * serially — the global persistent-RDD registry is race-free here.)
  */
class CacheCleanupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("PageRank loops release superseded rounds, edges, and degrees") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("vec_id")
    for (full <- Seq(false, true)) {
      spark.catalog.clearCache()
      val ranker =
        if (full) Similarity.graphRankFullOf _ else Similarity.graphRankOf _
      val n = ranker(edges, nodes).count()
      assert(n === 4)
      // the ONLY surviving cache entry is the materialized final rank
      // vector the returned plan reads; every per-round vector, the edge
      // frame, and the degree table must already be unpersisted
      val persisted = spark.sparkContext.getPersistentRDDs
      assert(persisted.size <= 1,
        s"full=$full leaked ${persisted.size} cached frames: " +
          persisted.values.map(_.name).mkString("; "))
    }
    spark.catalog.clearCache()
  }

  test("dd family + pipe_corpus leave at most one cached frame per query") {
    // The labelPropagate consumers persist corpus-scale intermediates
    // (shingles, pairs, edges, per-round checkpoint blocks). Each must
    // release everything except its own materialized result before the
    // query returns — localCheckpoint blocks in particular are invisible
    // to catalog.clearCache, so a leak here survives the session-level
    // cleanup between bench queries and compounds across 3 passes × 4
    // consumers (the r12 weak-5 mechanism).
    val dir = TestSpark.sfDir
    for (q <- Seq("dd_neardup", "dd_cluster", "dd_cluster_stats",
        "dd_survivors", "dd_passage_decontaminate", "pipe_corpus",
        "dd_edit_verify", "dd_decontaminate", "dd_ngram_jaccard",
        "dd_embed_neardup", "dd_passage_overlap", "dd_bloom_decontaminate",
        "dd_containment", "dd_substring", "mm_phash_neardup")) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val n = SparkEntry.queries(q)(spark, dir).count()
      assert(n >= 0)
      val persisted = spark.sparkContext.getPersistentRDDs
      assert(persisted.size <= 1,
        s"$q leaked ${persisted.size} cached frames: " +
          persisted.values.map(r => s"${r.id}:${r.name}").mkString("; "))
    }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
