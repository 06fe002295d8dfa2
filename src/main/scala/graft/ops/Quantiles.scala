package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact interpolated quantiles with BOUNDED state at any input size —
  * the scale-safe replacement for Spark's exact `percentile` aggregate
  * over near-unique value domains.
  *
  * Spark's `Percentile` buffers every distinct (value, count) pair of a
  * group inside the final reducer: fine at thousands of rows per group,
  * fatal at billions (the `q_approx_percentiles` scaladoc rule — the r16
  * verdict's one flagged anti-pattern). This module computes the SAME
  * interpolated order statistic — arithmetic identical to Spark's
  * `percentile` and hash-compatible with DuckDB's `quantile_cont`, so
  * every oracle stays untouched — by distributed rank selection:
  *
  *  1. equi-depth bucket boundaries from one `approx_percentile` sketch
  *     pass per group (fixed-size positional sketch, map-side partial).
  *     The boundaries steer DATA PLACEMENT only; they never touch the
  *     answer, so the sketch's error bound is irrelevant to correctness.
  *  2. cell row-counts (a ≤ [[Buckets]]·|groups| frame) prefix-summed
  *     into exclusive global rank offsets — the only unpartitioned-
  *     per-group window in the plan runs over ≤ [[Buckets]] rows.
  *  3. per-(bucket, group) local ranks via `row_number` — but ONLY over
  *     the ≤ 2·|ps| HOT cells per group whose global-rank span contains
  *     a target rank (r18 pruning: the offset broadcast is filtered to
  *     hot cells by pure column arithmetic, and the inner join drops
  *     every other cell before the window, so the plan's one
  *     corpus-scale SORT shrinks to ~2·|ps|/Buckets of the input). Each
  *     surviving cell holds ~n/[[Buckets]] rows (plus ties at one value,
  *     which the strict `>` bucket rule keeps together); the window SORT
  *     is external and spills, and the `row_number` frame itself buffers
  *     nothing.
  *  4. the ≤ 2 rows sitting at global ranks ⌊p·(n−1)⌋ / ⌈p·(n−1)⌉ are
  *     picked by broadcast join and interpolated with Spark's exact
  *     formula `lo·(⌈pos⌉−pos) + hi·(pos−⌊pos⌋)`, returning `lo`
  *     verbatim when the two ranks coincide or hold equal values — the
  *     FP identities Spark's `Percentile.getPercentile` guarantees and
  *     DuckDB's `quantile_cont` shares, so tie rows bucket identically
  *     in both engines.
  *
  * Nothing in the plan holds more than one bucket cell's sort run, and
  * every broadcast frame is bounded by Buckets·|groups|·|ps| rows by
  * construction — at 100 TB the heavy lifting is one corpus-scale
  * map-side-partial count exchange plus the hot-cell window's exchange
  * over ~2·|ps|/Buckets of the input, both spill-safe.
  */
object Quantiles {

  /** Equi-depth buckets per group: bounds each window cell at ~n/Buckets
    * rows and every small frame at Buckets·|groups| rows. 128 keeps the
    * offset frames trivially broadcastable while leaving cells ≤ 1 % of
    * the corpus each at any scale.
    */
  private[graft] val Buckets = 128

  /** Exact interpolated quantiles of `valueCol` per `groupCols` cell: one
    * output row per group (a single global row when `groupCols` is empty),
    * one DOUBLE column per requested (name, p). NULL values are skipped,
    * matching the `percentile` aggregate; a group whose values are all
    * NULL produces no row. Column names `__v/__b/__bs/__lr/__c/__off/
    * __gr/__qi/...` are reserved internally — callers pass plain frames.
    *
    * Cache contract (the q_mad_outliers lesson made structural): the plan
    * below evaluates its input several times (bounds, bucketing, cell
    * counts, hot-cell ranking), so the 2-column `vals` projection is
    * persisted HERE — every caller gets the one-scan discipline for free
    * instead of re-running a corpus-scale upstream per evaluation
    * (measured on q_mad_outliers: 204 s unpersisted vs 59.8 s at factor
    * 100) — UNLESS the caller's frame is already cached, in which case
    * the passes re-project from that cache and no second corpus-scale
    * cache is built. The bounded result (|groups|·|ps| cells) is
    * materialized into its own MEMORY_AND_DISK cache before the internal
    * caches are released, so the RETURNED frame never re-enters the
    * rank-selection pipeline. The caller owns that one cache: pass it to
    * `Dedup.materializeThenRelease` (or unpersist it) before the query
    * returns — CacheCleanupSpec pins the ≤ 1-surviving-frame rule
    * suite-wide.
    */
  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
            ps: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.storage.StorageLevel.{MEMORY_AND_DISK, NONE}
    val g = groupCols.map(col)
    val pre = df.filter(col(valueCol).isNotNull)
      .select(g :+ col(valueCol).cast("double").as("__v"): _*)
    // Skip the internal persist when the caller's frame is ALREADY cached
    // (ev_gap_audit / ev_lateness_audit / txt_ppl_bucket / pipe_classified
    // pattern): re-projecting two columns out of the caller's cache per
    // pass is cheaper than materializing a second, near-identical cache.
    val inputCached = df.storageLevel != NONE
    val vals = if (inputCached) pre else pre.persist(MEMORY_AND_DISK)
    def joinSmall(l: DataFrame, r: DataFrame): DataFrame =
      if (groupCols.isEmpty) l.crossJoin(broadcast(r))
      else l.join(broadcast(r), groupCols)

    // 1. placement boundaries: ≤ Buckets−1 approximate equi-depth cuts
    val probs = (1 until Buckets).map(i => i.toDouble / Buckets)
    val bounds = vals.groupBy(g: _*)
      .agg(expr(s"approx_percentile(__v, array(${probs.mkString(",")}), 100)")
        .as("__bs"))
    val bucketed = joinSmall(vals, bounds)
      .withColumn("__b", expr("aggregate(__bs, 0, (a, t) -> a + if(__v > t, 1, 0))"))
      .drop("__bs")

    // 2. cell counts → exclusive prefix-sum offsets (≤ Buckets rows/group),
    // plus the per-group total for the hot-cell test below — all tiny-frame
    // window arithmetic under one broadcast build.
    val cells = bucketed.groupBy(col("__b") +: g: _*).agg(count(lit(1)).as("__c"))
    val wOff = Window.partitionBy(g: _*).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offc = cells
      .withColumn("__off", coalesce(sum("__c").over(wOff), lit(0L)))
      .withColumn("__n", sum("__c").over(Window.partitionBy(g: _*)))

    // 3. HOT-BUCKET PRUNING (r18): a cell needs local ranks only if it
    // holds one of the ≤ 2·|ps| target global ranks of its group — rank
    // r (1-indexed) lives in cell (__b, g) iff __off < r ≤ __off + __c,
    // exactly the span of the cell's rows' global ranks. `ps` is a static
    // list, so the test is pure column arithmetic over the bounded offset
    // frame (no extra join, no extra pass): the offsets broadcast simply
    // carries only the hot cells, and the inner join below prunes the
    // corpus BEFORE the rank window — the plan's one corpus-scale SORT
    // shrinks to ~2·|ps|/Buckets of the input. The answer is identical:
    // rows outside hot cells can never satisfy the __gr ∈ {__lo+1, __hi+1}
    // pick, and local ranks inside a cell don't depend on other cells.
    val hotCond = ps.map { case (_, p) =>
      val pos = lit(p) * (col("__n") - 1).cast("double")
      val lo1 = floor(pos).cast("long") + 1
      val hi1 = ceil(pos).cast("long") + 1
      (lo1 > col("__off") && lo1 <= col("__off") + col("__c")) ||
        (hi1 > col("__off") && hi1 <= col("__off") + col("__c"))
    }.reduce(_ || _)
    val offs = offc.filter(hotCond).select(col("__b") +: g :+ col("__off"): _*)

    // target global ranks per (group, p): pos = p·(n−1), 0-indexed
    val qStructs = ps.zipWithIndex.map { case ((_, p), i) =>
      struct(lit(i).as("qi"), lit(p).as("p"))
    }
    val targets = cells.groupBy(g: _*).agg(sum("__c").as("__n"))
      .select(g :+ col("__n") :+ explode(array(qStructs: _*)).as("__q"): _*)
      .select(g :+ col("__q.qi").as("__qi") :+
        (col("__q.p") * (col("__n") - 1).cast("double")).as("__pos"): _*)
      .withColumn("__lo", floor(col("__pos")).cast("long"))
      .withColumn("__hi", ceil(col("__pos")).cast("long"))

    // 4. local rank within each HOT (bucket, group) cell — the inner join
    // against the pruned offset broadcast both attaches __off and drops
    // every cold cell before the window sort
    val wCell = Window.partitionBy(col("__b") +: g: _*).orderBy("__v")
    val granked = bucketed.join(broadcast(offs), "__b" +: groupCols)
      .withColumn("__lr", row_number().over(wCell))
      .withColumn("__gr", col("__off") + col("__lr"))
    val picked = joinSmall(granked, targets)
      .filter(col("__gr") === col("__lo") + 1 || col("__gr") === col("__hi") + 1)
      .groupBy(g :+ col("__qi"): _*)
      .agg(max(when(col("__gr") === col("__lo") + 1, col("__v"))).as("__lv"),
        max(when(col("__gr") === col("__hi") + 1, col("__v"))).as("__hv"),
        first("__pos").as("__fpos"), first("__lo").as("__flo"),
        first("__hi").as("__fhi"))
    val qv = when(col("__flo") === col("__fhi") || col("__lv") === col("__hv"),
        col("__lv"))
      .otherwise(col("__lv") * (col("__fhi").cast("double") - col("__fpos")) +
        col("__hv") * (col("__fpos") - col("__flo").cast("double")))
    val wide = picked.withColumn("__qv", qv)
    val aggs = ps.zipWithIndex.map { case ((name, _), i) =>
      max(when(col("__qi") === i, col("__qv"))).as(name)
    }
    val out = wide.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
    // Materialize the bounded result, then drop the internal caches (the
    // corpus-scale vals projection if this call owns one, and the tiny
    // cells frame) — Dedup.materializeThenRelease inlined to avoid a
    // cyclic module dependency.
    val fin = out.persist(MEMORY_AND_DISK)
    fin.count()
    if (!inputCached) vals.unpersist(false)
    fin
  }
}
