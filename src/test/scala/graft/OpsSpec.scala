package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.MapReduce
import graft.ops.{Dedup, Similarity, TextOps}

/** Operator-level invariants on the sf0.001 fixtures — cheap structural
  * checks that hold at any scale (the value-level gate is the DuckDB oracle
  * in tools/check.py; these catch semantic regressions earlier and cover
  * what SQL can't, e.g. expression-vs-JVM tokenizer agreement).
  */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("TextOps.tokens expression agrees with the JVM-side reference tokenizer") {
    import spark.implicits._
    val rows = Tables.documents(spark, dir)
      .select(col("text"), TextOps.tokens(col("text")).as("toks"))
      .as[(String, Seq[String])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (text, toks) =>
      val jvm = text.toLowerCase.split(MapReduce.WhitespaceClass).filter(_.nonEmpty).toSeq
      assert(toks === jvm)
    }
  }

  test("dd_exact: winners are unique per fingerprint and dup counts cover the table") {
    import spark.implicits._
    val total = Tables.documents(spark, dir).count()
    val winners = Dedup.exactDedup(spark, dir)
    val fps = winners.select("fp").as[String].collect()
    assert(fps.distinct.length === fps.length) // one winner per group
    val covered = winners.agg(sum("dup_cnt")).head.getLong(0)
    val nullFp = Tables.documents(spark, dir)
      .select(when(size(TextOps.tokens(col("text"))) <= 0, 1).otherwise(0).as("z"))
      .agg(sum("z")).head.getLong(0)
    assert(covered + nullFp === total) // every doc is either covered or token-less
  }

  test("dd_simhash: 32-bit binary signatures for every tokenized doc") {
    import spark.implicits._
    val sigs = Dedup.simhash(spark, dir).select("simhash").as[String].collect()
    assert(sigs.nonEmpty)
    assert(sigs.forall(s => s.length == 32 && s.forall(c => c == '0' || c == '1')))
  }

  test("sim_brute_topk: k results per query, cosine in [-1,1], ranked descending") {
    import spark.implicits._
    val rows = Similarity.bruteTopK(spark, dir)
      .select("q_id", "rnk", "cos_sim").as[(Long, Int, Double)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size === 8)
    byQ.values.foreach { g =>
      assert(g.map(_._2).sorted.toSeq === (1 to 5))
      val cs = g.sortBy(_._2).map(_._3)
      assert(cs.forall(c => c >= -1.0001 && c <= 1.0001))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }) // monotone in rank
    }
  }

  test("sim_lsh_topk is a subset of the brute-force ranking with identical scores") {
    import spark.implicits._
    val brute = Similarity.bruteTopK(spark, dir)
      .select("q_id", "vec_id", "cos_sim").as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    val lsh = Similarity.lshTopK(spark, dir)
      .select("q_id", "vec_id", "cos_sim").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (q, v, c) =>
      brute.get((q, v)).foreach(bc => assert(math.abs(bc - c) < 1e-9))
    }
  }

  test("sim_ivf_assign: every vector assigned to exactly one of the 10 label centroids") {
    import spark.implicits._
    val rows = Similarity.ivfAssign(spark, dir)
      .select("vec_id", "assigned").as[(Long, Int)].collect()
    assert(rows.length === Tables.embeddings(spark, dir).count())
    assert(rows.map(_._1).distinct.length === rows.length)
    assert(rows.forall { case (_, a) => a >= 0 && a <= 9 })
  }

  test("txt_sample_stratified: deterministic, and strata hit their target rates") {
    import spark.implicits._
    val a = TextOps.stratifiedSample(spark, dir).select("doc_id").as[Long].collect().toSeq
    val b = TextOps.stratifiedSample(spark, dir).select("doc_id").as[Long].collect().toSeq
    assert(a === b) // hash-derived uniform — no RNG, rerun-stable
    val totals = Tables.documents(spark, dir).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val kept = TextOps.stratifiedSample(spark, dir).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    totals.foreach { case (lang, n) =>
      val rate = kept.getOrElse(lang, 0L).toDouble / n
      val target = if (lang == "en") 0.10 else 0.50
      // binomial tolerance at the fixture's stratum sizes (n >= 64)
      assert(math.abs(rate - target) < 0.2, s"$lang: got $rate want ~$target")
    }
  }

  test("txt_pack: packs start below the budget boundary and cover every doc") {
    import spark.implicits._
    val Budget = 2048
    val rows = TextOps.packSequences(spark, dir)
      .select("lang", "shard", "n_tokens", "pack_id")
      .as[(String, Long, Int, Long)].collect()
    assert(rows.length === Tables.documents(spark, dir).count())
    // reconstruct each (lang, shard) stream: a doc's start offset must lie
    // inside its pack's [pack_id*B, (pack_id+1)*B) chunk
    rows.groupBy(r => (r._1, r._2)).values.foreach { g =>
      var off = 0L
      // rows within a group arrive in doc_id order via the final orderBy
      g.foreach { case (_, _, n, pack) =>
        assert(pack === off / Budget, s"start offset $off landed in pack $pack")
        off += n
      }
    }
  }

  test("dd_decontaminate flags only training docs, never benchmark docs") {
    import spark.implicits._
    val flagged = Dedup.decontaminate(spark, dir).select("doc_id").as[Long].collect().toSet
    val bench = Tables.documents(spark, dir)
      .filter(col("source").isin((0 until 5).map(i => s"src$i"): _*))
      .select("doc_id").as[Long].collect().toSet
    assert(flagged.intersect(bench).isEmpty)
  }
}
