package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** The composed end-to-end training-corpus pipeline — the reason the other
  * operator families exist. One declarative job chains the stages a
  * pretraining data pipeline runs over raw documents:
  *
  *  1. quality gate        — [[TextOps.c4Filter]] keep-decision
  *  2. exact dedup         — [[Dedup.exactDedup]] canonical winner per
  *                           token-stream fingerprint
  *  3. near-dup dedup      — [[Dedup.survivors]] keep-list (one canonical
  *                           doc per MinHash cluster)
  *  4. decontamination     — drop docs sharing any verbatim 5-token passage
  *                           with the benchmark sources
  *                           ([[Dedup.passageDecontaminate]])
  *
  * The benchmark sources themselves are EXCLUDED from the output (a
  * training corpus must never contain the eval set). The dedup winner
  * election deliberately runs corpus-WIDE (bench included): a training doc
  * that exactly or nearly duplicates a bench doc then loses the winner
  * election to the (lower-id or clustered) bench copy, and the bench copy
  * is removed by the source filter — i.e. the whole contaminated
  * duplicate-cluster disappears, which is exactly what document-level
  * decontamination wants; the passage gate then catches partial overlaps.
  *
  * Because every stage is a DataFrame, the composition is declarative: the
  * gates are semi/anti equi-joins on high-cardinality doc_id (AQE
  * broadcasts the small keep-lists), so composing costs no new scan of the
  * corpus per stage beyond what the stages themselves need. The quality and
  * exact-dedup gates fuse into the final join DAG; the near-dup and passage
  * stages arrive as already-materialized bounded keep-lists (the iterative
  * label propagation inside [[Dedup.survivors]] cannot be expressed as one
  * lazy plan anyway) and are released as soon as the composed output
  * materializes — the query leaves one cached frame, not one per stage.
  * The DuckDB oracle composes the same stage oracles as derived
  * tables — the gate proves the COMPOSITION, not just the parts.
  */
object Pipeline extends QueryModule {

  def corpus(s: SparkSession, dir: String): DataFrame = {
    val keep = TextOps.c4Filter(s, dir).filter(col("keep")).select("doc_id")
    val exactWinners = Dedup.exactDedup(s, dir).select("doc_id")
    val (surv, releaseSurv) = Dedup.survivorsWithRelease(s, dir)
    val (contam, releaseContam) = Dedup.passageDecontaminateWithRelease(s, dir)
    val out = Tables.documents(s, dir)
      .filter(!col("source").isin(Dedup.BenchSources: _*))
      .join(keep, "doc_id")
      .join(exactWinners, "doc_id")
      .join(surv.select("doc_id"), "doc_id")
      .join(contam.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Materialize the final corpus keep-list, then release the two stage
    // caches it consumed — the composed query leaves ONE cached frame in
    // the session, not one per stage (CacheCleanupSpec pins this).
    out.count()
    releaseSurv()
    releaseContam()
    out.orderBy("doc_id")
  }

  /** The to-TRAINER handoff, composed: quality gate → leakage-safe split →
    * token packing → shard MANIFEST. [[TextOps.c4Filter]]'s keep-decision
    * gates the corpus, [[Dedup.leakageSplit]] assigns train/val/test by
    * exact-dedup fingerprint (verbatim duplicates can never straddle a
    * split), and the kept docs pack into 2048-token sequences per
    * (split, lang, 16-way md5 shard). The output is the bounded manifest a
    * trainer's data loader reads: docs/tokens/packs per (split, lang,
    * shard). `n_packs` is the EXACT number of 2048-token sequences the
    * cell's contiguous concatenation emits — ceil(n_tokens / 2048) in pure
    * integer arithmetic, so a single doc longer than the budget counts
    * every sequence it spans (the r14 starting-offset-bucket count could
    * undercount there and mislead a data loader sizing its epoch).
    *
    * Scale shape: the gates are doc_id equi-joins (AQE broadcasts the
    * keep-list side when small); the pack count is now derived from the
    * cell's token SUM, so the manifest needs no window at all — one
    * map-side-partial hash aggregate onto ≤ |splits|·|langs|·NShards
    * rows. The oracle composes the stage oracles as derived tables: the
    * gate proves the composition.
    */
  def shards(s: SparkSession, dir: String): DataFrame = {
    val Budget = 2048
    val keep = TextOps.c4Filter(s, dir).filter(col("keep")).select("doc_id")
    val sp = Dedup.leakageSplit(s, dir).select(col("doc_id"), col("split"))
    val shard = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"),
      lit(16L))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(keep, "doc_id")
      .join(sp, "doc_id")
      .withColumn("shard", shard)
      .groupBy("split", "lang", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      // exact integer ceil — safe past 2^53 tokens where a double divide
      // would round
      .withColumn("n_packs", expr(s"(n_tokens + ${Budget - 1}) div $Budget"))
      .orderBy("split", "lang", "shard")
  }

  /** The per-source DATA CARD — the attrition funnel every training run
    * publishes alongside its corpus (the Datasheets-for-Datasets /
    * data-card practice): for each source, total documents, how many pass
    * the quality gate, how many are exact-dedup winners, how many carry
    * benchmark passage contamination, and how many — with how many
    * tokens — survive the full [[corpus]] composition. The final-count
    * column uses the SAME stage predicates as pipe_corpus (bench sources
    * excluded, quality ∧ exact-winner ∧ near-dup-survivor ∧
    * ¬contaminated), so `sum(n_final)` here equals pipe_corpus's row
    * count by construction — the card audits the pipeline it describes.
    *
    * Scale shape: one corpus scan tokenizes and derives every stage flag
    * via doc_id equi-joins (AQE broadcasts the bounded keep-lists — no
    * new corpus pass per stage); the rollup is a map-side-partial hash
    * aggregate onto ≤ |sources| rows. The stage caches release once the
    * bounded card materializes (≤ 1 cached frame).
    */
  def datacard(s: SparkSession, dir: String): DataFrame = {
    val keep = TextOps.c4Filter(s, dir).filter(col("keep"))
      .select(col("doc_id"), lit(1L).as("q"))
    val winners = Dedup.exactDedup(s, dir).select(col("doc_id"), lit(1L).as("w"))
    val (surv, releaseSurv) = Dedup.survivorsWithRelease(s, dir)
    val (contam, releaseContam) = Dedup.passageDecontaminateWithRelease(s, dir)
    val isBench = col("source").isin(Dedup.BenchSources: _*)
    val fin = when(!isBench && col("q").isNotNull && col("w").isNotNull &&
      col("sv").isNotNull && col("ct").isNull, 1L).otherwise(0L)
    val out = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(keep, Seq("doc_id"), "left")
      .join(winners, Seq("doc_id"), "left")
      .join(surv.select(col("doc_id"), lit(1L).as("sv")), Seq("doc_id"), "left")
      .join(contam.select("doc_id").dropDuplicates("doc_id")
        .withColumn("ct", lit(1L)), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("q"), lit(0L))).as("n_quality"),
        sum(coalesce(col("w"), lit(0L))).as("n_exact_unique"),
        sum(coalesce(col("ct"), lit(0L))).as("n_contaminated"),
        sum(fin).as("n_final"),
        sum(when(fin === 1L, col("n_tokens")).otherwise(lit(0L)))
          .as("n_tokens_final"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    releaseSurv()
    releaseContam()
    out.orderBy("source")
  }

  /** The quality-TIERED split manifest — the CCNet move completed in-engine:
    * the trained domain classifier's margins ([[TextOps.classifierScoreOf]])
    * bucket the corpus into head/middle/tail terciles, crossed with the
    * leakage-safe train/val/test assignment, rolled up to docs + tokens +
    * exact margin sums per (split, tier). This is the table a curriculum /
    * quality-mixing schedule reads ("train on head first", "cap tail at
    * 10%"), published per split so the tiers can't leak across the
    * boundary dd_leakage_split guarantees.
    *
    * Scale shape: the scoring loop's state is bounded (≤ EmbedDim + 1), so
    * the whole pipeline is the scored-corpus pass + the tercile cutoffs
    * from [[Quantiles.exact]] (bounded-state rank selection — per-doc
    * margins are near-unique, so an exact `percentile` buffering the full
    * multiset is the r16 verdict's flagged scale-killer) broadcast as a
    * 1-row scalar + the bounded split join, folding map-side into ≤ 9
    * rows. The oracle composes the classifier-score and leakage-split
    * stage oracles — the gate proves the COMPOSITION, not just the stages.
    */
  def classified(s: SparkSession, dir: String): DataFrame = {
    val scored = TextOps.classifierScoreOf(Tables.documents(s, dir))
    val sp = Dedup.leakageSplit(s, dir).select(col("doc_id"), col("split"))
    val cuts = Quantiles.exact(scored, Seq.empty, "score",
      Seq("q33" -> 0.3333333333333333, "q66" -> 0.6666666666666666))
    // tail = lowest margins (least target-domain-like), head = highest
    val tiered = scored.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("score"),
        when(col("score") <= col("q33"), "tail")
          .when(col("score") <= col("q66"), "middle")
          .otherwise("head").as("tier"))
    val out = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(tiered, "doc_id")
      .join(sp, "doc_id")
      .groupBy("split", "tier")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum("score").as("sum_margin"),
        min("score").as("min_margin"), max("score").as("max_margin"))
      .orderBy("split", "tier")
    Dedup.materializeThenRelease(out, scored, cuts)
  }

  /** Tokens drawn per training epoch, apportioned by [[epochPlan]]. */
  private[graft] val EpochBudget = 1000000L

  /** The epoch sampling plan — the mixing story completed to an executable
    * artifact: txt_mix_weights says WHAT fraction of each (lang, source)
    * slice an epoch should carry; this op turns those α-smoothed weights
    * into an EXACT integer allocation of the [[EpochBudget]]-token epoch
    * via largest-remainder (Hamilton) apportionment — quota = ⌊B·aᵢ/Σa⌋,
    * then the B − Σquota leftover tokens go to the largest integer
    * remainders (B·aᵢ mod Σa, ties to (lang, source) order). Σ alloc ≡ B
    * by construction — the invariant a trainer's data loader needs, which
    * no per-cell rounding of B·wᵢ can guarantee. All apportionment
    * arithmetic is BIGINT (the weight enters as its exact ×10⁸ DECIMAL
    * unscaling), so both engines agree bit-for-bit including on remainder
    * ties; `upsample` = alloc/n_tokens is the per-slice repetition factor
    * the schedule implies.
    *
    * Scale shape: the corpus collapses to |lang×source| rows in the one
    * map-side-partial aggregate inside [[TextOps.smoothedShares]];
    * everything after — two 1-row broadcast scalars and the
    * remainder-ranking window — runs on that bounded handful of rows (the
    * unpartitioned window is legal HERE because its input is the bounded
    * cell table, never a corpus-scale frame).
    */
  def epochPlan(s: SparkSession, dir: String): DataFrame =
    epochPlanOf(Tables.documents(s, dir))

  private[graft] def epochPlanOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = TextOps.smoothedShares(docs)
      .select(col("lang"), col("source"), col("n_tokens"),
        (col("w8") * lit(100000000L)).cast("long").as("a"))
    val ta = broadcast(a.agg(sum("a").as("ta")))
    val q = a.crossJoin(ta)
      .withColumn("quota", expr(s"(${EpochBudget}L * a) div ta"))
      .withColumn("rem", expr(s"(${EpochBudget}L * a) % ta"))
    val spare = broadcast(q.agg((lit(EpochBudget) - sum("quota")).as("spare")))
    val rk = Window.orderBy(col("rem").desc, col("lang").asc, col("source").asc)
    q.crossJoin(spare)
      .withColumn("rnk", row_number().over(rk).cast("long"))
      .withColumn("alloc_tokens",
        col("quota") + when(col("rnk") <= col("spare"), 1L).otherwise(0L))
      .select(col("lang"), col("source"), col("n_tokens"), col("alloc_tokens"),
        round(col("alloc_tokens").cast("double") / lit(EpochBudget.toDouble), 6)
          .as("alloc_share"),
        // a zero-token cell (all-empty docs) gets weight 0 but must not
        // divide by zero: Spark yields NULL where DuckDB yields inf
        when(col("n_tokens") === 0, lit(0.0)).otherwise(
          round(col("alloc_tokens").cast("double") / col("n_tokens"), 4))
          .as("upsample"))
      .orderBy("lang", "source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_corpus" -> (corpus(_, _)),
    "pipe_epoch_plan" -> (epochPlan(_, _)),
    "pipe_datacard" -> (datacard(_, _)),
    "pipe_classified" -> (classified(_, _)),
    "pipe_shards" -> (shards(_, _)))

  val oracles: Map[String, String] = Map(
    "pipe_epoch_plan" ->
      s"""WITH d AS (
         |  SELECT lang, source,
         |    len(${graft.OracleSql.toks("lower(text)")})::BIGINT AS n
         |  FROM documents
         |), g AS (
         |  SELECT lang, source, sum(n)::BIGINT AS n_tokens
         |  FROM d GROUP BY lang, source
         |), t AS (
         |  SELECT sum(n_tokens)::BIGINT AS tot FROM g
         |), sh AS (
         |  SELECT lang, source, n_tokens,
         |    CAST(round(pow(round(n_tokens::DOUBLE / tot, 6),
         |      ${TextOps.MixAlpha}), 8)::DECIMAL(18,8) * 100000000 AS BIGINT) AS a
         |  FROM g, t
         |), ta AS (
         |  SELECT sum(a)::BIGINT AS ta FROM sh
         |), q AS (
         |  SELECT lang, source, n_tokens, a,
         |    ($EpochBudget * a) // ta AS quota,
         |    ($EpochBudget * a) % ta AS rem
         |  FROM sh, ta
         |), sp AS (
         |  SELECT ($EpochBudget - sum(quota))::BIGINT AS spare FROM q
         |), r AS (
         |  SELECT *, row_number() OVER (ORDER BY rem DESC, lang, source) AS rnk
         |  FROM q
         |)
         |SELECT lang, source, n_tokens,
         |  (quota + CASE WHEN rnk <= spare THEN 1 ELSE 0 END)::BIGINT AS alloc_tokens,
         |  round((quota + CASE WHEN rnk <= spare THEN 1 ELSE 0 END)::DOUBLE
         |    / $EpochBudget, 6) AS alloc_share,
         |  CASE WHEN n_tokens = 0 THEN 0.0 ELSE
         |    round((quota + CASE WHEN rnk <= spare THEN 1 ELSE 0 END)::DOUBLE
         |      / n_tokens, 4) END AS upsample
         |FROM r, sp ORDER BY lang, source""".stripMargin,
    "pipe_corpus" ->
      s"""WITH keepq AS (
         |  SELECT doc_id FROM (${TextOps.oracles("txt_c4_filter")}) WHERE keep
         |), winners AS (
         |  SELECT doc_id FROM (${Dedup.oracles("dd_exact")})
         |), surv AS (
         |  SELECT doc_id FROM (${Dedup.oracles("dd_survivors")})
         |), contam AS (
         |  SELECT doc_id FROM (${Dedup.oracles("dd_passage_decontaminate")})
         |)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d
         |JOIN keepq USING (doc_id)
         |JOIN winners USING (doc_id)
         |JOIN surv USING (doc_id)
         |WHERE d.source NOT IN (${Dedup.BenchSources.map(x => s"'$x'").mkString(", ")})
         |  AND d.doc_id NOT IN (SELECT doc_id FROM contam)
         |ORDER BY d.doc_id""".stripMargin,
    "pipe_datacard" ->
      s"""WITH keepq AS (
         |  SELECT doc_id FROM (${TextOps.oracles("txt_c4_filter")}) WHERE keep
         |), winners AS (
         |  SELECT doc_id FROM (${Dedup.oracles("dd_exact")})
         |), surv AS (
         |  SELECT doc_id FROM (${Dedup.oracles("dd_survivors")})
         |), contam AS (
         |  SELECT DISTINCT doc_id FROM (${Dedup.oracles("dd_passage_decontaminate")})
         |), d AS (
         |  SELECT m.doc_id, m.source,
         |    len(${graft.OracleSql.toks("lower(m.text)")})::BIGINT AS n_tokens,
         |    m.doc_id IN (SELECT doc_id FROM keepq) AS q,
         |    m.doc_id IN (SELECT doc_id FROM winners) AS w,
         |    m.doc_id IN (SELECT doc_id FROM surv) AS sv,
         |    m.doc_id IN (SELECT doc_id FROM contam) AS ct,
         |    m.source IN (${Dedup.BenchSources.map(x => s"'$x'").mkString(", ")}) AS bench
         |  FROM documents m
         |)
         |SELECT source, count(*) AS n_docs,
         |  count(*) FILTER (WHERE q) AS n_quality,
         |  count(*) FILTER (WHERE w) AS n_exact_unique,
         |  count(*) FILTER (WHERE ct) AS n_contaminated,
         |  count(*) FILTER (WHERE q AND w AND sv AND NOT ct AND NOT bench) AS n_final,
         |  COALESCE(sum(n_tokens)
         |    FILTER (WHERE q AND w AND sv AND NOT ct AND NOT bench), 0)::BIGINT
         |    AS n_tokens_final
         |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "pipe_classified" ->
      s"""WITH scored AS (
         |  SELECT doc_id, score FROM (${TextOps.oracles("txt_classifier_score")})
         |), cuts AS (
         |  SELECT quantile_cont(score, 0.3333333333333333) AS q33,
         |    quantile_cont(score, 0.6666666666666666) AS q66
         |  FROM scored
         |), sp AS (
         |  SELECT doc_id, split FROM (${Dedup.oracles("dd_leakage_split")})
         |), d AS (
         |  SELECT m.doc_id,
         |    len(${graft.OracleSql.toks("lower(m.text)")})::BIGINT AS n_tokens,
         |    s.score, sp.split,
         |    CASE WHEN s.score <= (SELECT q33 FROM cuts) THEN 'tail'
         |         WHEN s.score <= (SELECT q66 FROM cuts) THEN 'middle'
         |         ELSE 'head' END AS tier
         |  FROM documents m JOIN scored s USING (doc_id) JOIN sp USING (doc_id)
         |)
         |SELECT split, tier, count(*)::BIGINT AS n_docs,
         |  sum(n_tokens)::BIGINT AS n_tokens,
         |  sum(score)::BIGINT AS sum_margin,
         |  min(score)::BIGINT AS min_margin, max(score)::BIGINT AS max_margin
         |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "pipe_shards" ->
      s"""WITH keepq AS (
         |  SELECT doc_id FROM (${TextOps.oracles("txt_c4_filter")}) WHERE keep
         |), sp AS (
         |  SELECT doc_id, split FROM (${Dedup.oracles("dd_leakage_split")})
         |), d AS (
         |  SELECT m.doc_id, m.lang,
         |    len(${graft.OracleSql.toks("lower(m.text)")})::BIGINT AS n_tokens,
         |    ('0x' || substr(md5(m.doc_id::VARCHAR), 1, 8))::BIGINT % 16 AS shard,
         |    sp.split
         |  FROM documents m JOIN keepq USING (doc_id) JOIN sp USING (doc_id)
         |)
         |SELECT split, lang, shard, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  (CAST(sum(n_tokens) AS BIGINT) + 2047) // 2048 AS n_packs
         |FROM d GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)
}
