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
}
