package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** The 100×-scale contract of the hyperplane-LSH banding: band width grows
  * with log₂(corpus) so the EXPECTED bucket population stays near
  * TargetBucket, and a population cap re-splits observed skew — together
  * keeping candidate pairs (Σ bucket²) linear in corpus size instead of
  * quadratic-at-fixed-width.
  */
class LshBandingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("band width scales with log2(corpus) between the clamps") {
    // at/below the floor: 16·2^8 = 4096 vectors fit 8-bit bands
    assert(Similarity.bandBits(1) === Similarity.MinBandBits)
    assert(Similarity.bandBits(4096) === 8)
    // exact power-of-two boundary is integer-compared, no float log2 hazard
    assert(Similarity.bandBits(4097) === 9)
    // 10× / 100× corpus → +log2 bits, expected population unchanged
    assert(Similarity.bandBits(50000) === 12)
    assert(Similarity.bandBits(5000000) === 19)
    // clamp: a 10^9-vector corpus uses 24-bit bands (16M buckets/band)
    assert(Similarity.bandBits(1000000000L) === Similarity.MaxBandBits)
    assert(Similarity.bandBits(Long.MaxValue / 2) === Similarity.MaxBandBits)
  }

  test("bucket cap re-splits a skewed fixture to bounded population") {
    import spark.implicits._
    // Skewed fixture: 4096 deterministic pseudo-random vectors banded at a
    // deliberately narrow 2-bit width — 4 buckets/band, ~1k vectors each,
    // far above BucketCap. The cap must re-split every oversize bucket by
    // the extra signature bits.
    val rnd = new scala.util.Random(42)
    val vecs = Seq.tabulate(4096) { id =>
      (id.toLong, Array.fill(Similarity.Dim)((rnd.nextInt(2000001) - 1000000).toLong))
    }
    val c = vecs.toDF("vec_id", "vq")

    def maxPop(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy("b_idx", "band").count().agg(max("count")).head.getLong(0)

    val before = maxPop(Similarity.bandedWithBits(c, 2, applyCap = false))
    val after = maxPop(Similarity.bandedWithBits(c, 2))
    assert(before > Similarity.BucketCap, "fixture must be skewed for the test to bite")
    assert(after <= Similarity.BucketCap,
      s"re-split left a bucket of $after > cap ${Similarity.BucketCap}")
  }

  test("banding is deterministic and respects row identity") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(256) { id =>
      (id.toLong, Array.fill(Similarity.Dim)((rnd.nextInt(2000001) - 1000000).toLong))
    }
    val c = vecs.toDF("vec_id", "vq")
    val a = Similarity.bandedWithBits(c, 4).orderBy("vec_id", "b_idx").collect().toSeq
    val b = Similarity.bandedWithBits(c, 4).orderBy("vec_id", "b_idx").collect().toSeq
    assert(a === b)
    assert(a.size === 256 * Similarity.BandCount) // one row per (vector, band)
  }
}
