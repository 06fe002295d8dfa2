package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryModule, Tables}

/** A media asset: opaque payload bytes + typed metadata. The payload column
  * is BinaryType — at 100 TB this is the parquet-native shape for images /
  * audio / video frames (one blob per row, metadata in sibling columns).
  */
final case class MediaAsset(doc_id: Long, media_type: String, payload: Array[Byte])

/** Output row of the decode — fixed schema, so the downstream plan is fully
  * typed regardless of the codec: header magic, channel count, per-channel
  * byte means, whole-payload checksum.
  */
final case class DecodedAsset(doc_id: Long, media_type: String, n_bytes: Int,
    magic_hex: String, n_channels: Int, ch0_mean: Double, ch1_mean: Double,
    ch2_mean: Double, checksum: String)

/** 64-bit DCT perceptual-hash signature, packed as 4×16-bit bands — the
  * mm_dct_phash map output (fixed schema keeps the downstream join plan
  * fully typed).
  */
final case class DctSig(doc_id: Long, b0: Long, b1: Long, b2: Long, b3: Long)

/** mm_png_decode output row: image geometry + per-channel exact-integer
  * means (gray in slot 0; absent channels pin to 0.0). `png_bytes` (the
  * encoded size) is dropped before declaration — Deflater output is not
  * oracle-recomputable.
  */
final case class PngDecoded(doc_id: Long, media_type: String, width: Int,
    height: Int, color_type: Int, n_channels: Int, png_bytes: Int,
    ch0_mean: Double, ch1_mean: Double, ch2_mean: Double, alpha_mean: Double)

/** mm_jpeg_decode detail row: geometry + SOURCE channel means (exact, the
  * oracle-recomputable side) + DECODED channel means (engine-side codec
  * evidence — JPEG is lossy, so these are deterministic but not
  * SQL-recomputable; the declared output serves them through the earned
  * `within_tol` gate and drops the raw values, the png_bytes precedent).
  */
final case class JpegDecoded(doc_id: Long, media_type: String, width: Int,
    height: Int, n_components: Int, sampling: String, jpeg_bytes: Int,
    ch0_src_mean: Double, ch1_src_mean: Double, ch2_src_mean: Double,
    ch0_dec_mean: Double, ch1_dec_mean: Double, ch2_dec_mean: Double)

/** mm_gif_decode output row: geometry + palette size + exact-integer RGB
  * means through the color table. `gif_bytes` (the LZW-encoded size) is
  * dropped before declaration — not oracle-recomputable, the png_bytes
  * rule.
  */
final case class GifDecoded(doc_id: Long, media_type: String, width: Int,
    height: Int, palette_size: Int, gif_bytes: Int,
    r_mean: Double, g_mean: Double, b_mean: Double)

/** Multimodal-column battery: image/audio/video handled as opaque `binary`
  * columns with typed metadata, per the LLM-pipeline mandate.
  *
  * The fixtures ship no binary column, so assets are derived
  * deterministically from `documents`: payload = UTF-8 bytes of `text`
  * (`cast to binary` ≡ DuckDB `text::BLOB` — the fixture text is pure
  * ASCII), media_type = source id mod 4. What matters is that every
  * operator below works on the BYTES, never the string: the same plans run
  * unchanged on real jpeg/wav blobs.
  *
  * ASCII-corpus assumption (shared by every oracle in [[oracles]]): the
  * engine side indexes PAYLOAD BYTES while the oracles index text with
  * character-based `ascii(substr(text, i, 1))` / `length(text)` — on pure
  * ASCII the two are identical, but any non-ASCII fixture breaks the
  * equivalence (byte count ≠ char count, byte value ≠ code point). A
  * non-ASCII corpus needs the oracles rewritten on `octet_length` + a
  * bytes view of `text` before the hash gate means anything.
  *
  * Decode itself (the codec) is STUBBED — no image/audio libraries exist in
  * this container — as a deterministic fake that treats payload bytes as
  * decoded samples ([[Multimodal.decodeStub]], clearly marked). Everything
  * around it — binary schema, chunked frame extraction, per-partition batch
  * iteration, typed output schema — is real and oracle-checked.
  */
object Multimodal extends QueryModule {

  private val FrameBytes = 256 // fixed "frame" size for sampling
  private val FrameStride = 4 // keep every 4th frame

  /** source "src<N>" → one of four media types, deterministically. */
  private def mediaType(source: Column): Column =
    element_at(array(lit("image"), lit("audio"), lit("video"), lit("text")),
      pmod(substring(source, 4, 10).cast("int"), lit(4)) + 1)

  /** documents → (doc_id, media_type, payload: binary). */
  private def assets(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), mediaType(col("source")).as("media_type"),
        col("text").cast("binary").as("payload"))

  // ------------------------------------------------------------ mm_meta_stats

  /** Catalog stats per media_type from metadata + payload length only — the
    * query shape that must NOT decode anything: `length(binary)` is a
    * codegen'd expression, the blob bytes never leave the scan.
    */
  def metaStats(s: SparkSession, dir: String): DataFrame =
    assets(s, dir)
      .groupBy("media_type")
      .agg(count(lit(1)).as("n"),
        sum(length(col("payload"))).as("total_bytes"),
        round(sum(length(col("payload"))).cast("double") / count(lit(1)), 6)
          .as("avg_bytes"),
        max(length(col("payload"))).as("max_bytes"))
      .orderBy("media_type")

  // ------------------------------------------------------- mm_decode_features

  /** Per-asset byte-level features as pure expressions: payload checksum,
    * 8-byte header fingerprint (what a real pipeline sniffs for magic
    * numbers), byte length. No shuffle at all until the final sort.
    */
  def decodeFeatures(s: SparkSession, dir: String): DataFrame =
    assets(s, dir)
      .select(col("doc_id"), col("media_type"),
        length(col("payload")).as("n_bytes"),
        lower(hex(substring(col("payload"), 1, 8))).as("header_hex"),
        md5(col("payload")).as("checksum"))
      .orderBy("doc_id")

  // --------------------------------------------------------- mm_frame_sample

  /** Frame sampling: split each payload into fixed 256-byte frames and keep
    * every 4th (what video frame-sampling does to a container blob). The
    * expansion is a generator expression — rows ≈ bytes/1024, no shuffle
    * before the per-frame checksum; at scale the sampled frames, not the
    * whole blobs, flow downstream.
    */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    assets(s, dir)
      // Empty payloads must emit zero frames (the oracle's range(0) is
      // empty): boundedSequence yields an empty array for them, and the
      // filter prunes the blobs before the generator even runs.
      .filter(length(col("payload")) > 0)
      .select(col("doc_id"), col("media_type"), col("payload"),
        posexplode(graft.functions.Exprs.boundedSequence(lit(0),
          ceil(length(col("payload")).cast("double") / FrameBytes).cast("int") - 1))
          .as(Seq("pos", "frame_idx")))
      .filter(col("frame_idx") % FrameStride === 0)
      .withColumn("frame",
        expr(s"substring(payload, frame_idx * $FrameBytes + 1, $FrameBytes)"))
      .select(col("doc_id"), col("media_type"), col("frame_idx"),
        length(col("frame")).as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  // --------------------------------------------------------- mm_frame_dedup

  /** Chunk-level binary dedup: every 256-byte frame of every payload is
    * fingerprinted, and each distinct frame gets one deterministic owner
    * (min (doc_id, frame_idx)) plus its copy count — the video-segment /
    * image-tile dedup a multimodal pipeline runs BELOW document granularity
    * (whole-payload dedup misses assets that share most of their bytes).
    * The frame fan-out is a generator inside the scan stage; the window
    * partitions on the high-cardinality frame digest — skew-free, and the
    * only shuffle carries (digest, doc, idx) rows, never the frame bytes.
    */
  def frameDedup(s: SparkSession, dir: String): DataFrame = {
    val fr = assets(s, dir)
      // Same empty-payload guard as frameSample.
      .filter(length(col("payload")) > 0)
      .select(col("doc_id"), col("payload"),
        posexplode(graft.functions.Exprs.boundedSequence(lit(0),
          ceil(length(col("payload")).cast("double") / FrameBytes).cast("int") - 1))
          .as(Seq("pos", "frame_idx")))
      .select(col("doc_id"), col("frame_idx"),
        md5(expr(s"substring(payload, frame_idx * $FrameBytes + 1, $FrameBytes)"))
          .as("frame_md5"))
    val w = Window.partitionBy("frame_md5")
    fr.withColumn("rnk",
        row_number().over(w.orderBy(col("doc_id"), col("frame_idx"))))
      .withColumn("n_copies", count(lit(1)).over(w))
      .filter(col("rnk") === 1)
      .select(col("frame_md5"), col("doc_id").as("first_doc"),
        col("frame_idx").as("first_idx"), col("n_copies"))
      .orderBy("first_doc", "first_idx")
  }

  // ------------------------------------------------------------- mm_resize

  /** "Resize" stub: stride-4 byte downsampling — the deterministic stand-in
    * for an image resize (swap the stride loop for a real scaler). Emits the
    * downsampled payload's size + checksum; like every stub here the
    * PLUMBING (byte addressing, per-row expression, no shuffle) is the real,
    * tested part. ASCII fixture ⇒ byte stride ≡ char stride, which is what
    * the oracle computes.
    */
  def resize(s: SparkSession, dir: String): DataFrame = {
    val tx = col("text")
    // stride-4 sampling as ONE codegen'd regex pass: each greedy match
    // consumes up to FrameStride chars and keeps the first ((?s): the dot
    // must cross newlines). The transform(sequence(...), substr)
    // formulation this replaces ran an interpreted lambda + string probe
    // per kept char (HOFs are CodegenFallback) — measured ~2× slower at
    // sf0.1 (1.26 s vs 0.64 s min-of-3).
    val resized = regexp_replace(tx, s"(?s)(.).{0,${FrameStride - 1}}", "$1")
    Tables.documents(s, dir)
      .select(col("doc_id"), mediaType(col("source")).as("media_type"),
        length(tx).as("orig_bytes"),
        length(resized).as("resized_bytes"),
        md5(resized.cast("binary")).as("resized_md5"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------- mm_typed_decode

  /** STUB DECODER — stands in for the real image/audio codec (libraries not
    * available in this container; swap this ONE function for e.g. a JNI
    * jpeg decode). Deterministic fake: treats the payload bytes themselves
    * as the decoded sample stream and reports their count / mean / md5.
    */
  // -------------------------------------------------------- mm_shard_manifest

  private[graft] val ShardBudget = 64 * 1024 // bytes per training shard (fixture-scaled)
  private val SubShards = 16 // running-sum parallelism per media type

  /** (doc_id, media_type, sub-lane, payload bytes) for every document —
    * the shared input of the batch [[shardManifest]] and its streaming
    * twin (`Streaming.shardAssignViaState`), factored so the two cannot
    * drift on lane derivation.
    */
  private[graft] def assetLanes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), mediaType(col("source")).as("media_type"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .withColumn("sub", pmod(
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"),
        lit(SubShards.toLong)))

  /** WebDataset-style training-shard manifest: assign every asset to a
    * byte-budgeted shard (deterministic doc_id order within its lane) and
    * emit one manifest row per shard — count, bytes, doc-id range — the
    * index a streaming data loader reads to fetch shards without listing
    * the corpus.
    *
    * Scale shape is the txt_pack trick restated for binary payloads: the
    * running byte-sum window partitions on (media_type, md5-hash sub-lane),
    * not media_type alone — 4 media types would pin a 100 TB corpus onto 4
    * window partitions, while [[SubShards]] hash lanes per type keep every
    * partition 1/64th of the corpus and the window's sort local to a lane.
    * Shard ids derive from the running sum (floor(cum_before / budget)), so
    * assignment needs no sequential pass; only payload LENGTH is read
    * (codegen'd `length(binary)`), blob bytes never move.
    */
  def shardManifest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("media_type", "sub").orderBy("doc_id")
    assetLanes(Tables.documents(s, dir))
      .withColumn("cum", sum(col("n_bytes")).over(w))
      .withColumn("shard_seq",
        floor((col("cum") - col("n_bytes")) / lit(ShardBudget.toDouble)).cast("long"))
      .groupBy("media_type", "sub", "shard_seq")
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("shard_bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("media_type", "sub", "shard_seq")
  }

  // ------------------------------------------------------ mm_phash_neardup

  private val PhashBits = 64     // signature width (one aHash bit per sample)
  private val PhashBandBits = 16 // 4 bands of 16 bits
  private val PhashHamT = 10     // accept pairs with hamming <= T
  private[graft] val PhashMinBytes = 64 // tiny blobs carry no signal (all-zero sigs)

  /** Perceptual-hash-style near-duplicate detection over binary payloads —
    * the ASSET-level near-dup that exact checksums (identical bytes only)
    * and [[frameDedup]] (shared aligned chunks) both miss. The signature is
    * a 1-D average hash (aHash): the payload is "resized" to [[PhashBits]]
    * position-normalized byte samples (nearest-neighbor over byte offsets —
    * robust to length drift the way image aHash is robust to resolution),
    * and bit i = sample i > sample mean, compared integer-exactly as
    * 64·sample > Σ samples. The REAL pHash — a 2-D DCT over decoded netpbm
    * pixels — is [[dctPhash]], which reuses every stage after the sampler
    * unchanged; this 1-D aHash stays as the cheaper signature for blobs
    * with no decodable image structure.
    *
    * Scale shape: signatures band into 4×16-bit keys, candidates come ONLY
    * from an equi-join on (band_idx, band_val) — pigeonhole-complete for
    * hamming ≤ 3 (a pair differing in ≤ 3 bits cannot dirty all 4 bands);
    * pairs between 4 and [[PhashHamT]] surface when at least one band
    * survives untouched — the documented LSH recall tradeoff, same class
    * as dd_embed_neardup's banding.
    *
    * The banded join runs over DISTINCT signatures, not documents. A 64-bit
    * aHash of text-derived payloads is deliberately lossy, and on a large
    * corpus many assets share one signature (the factor-100 probe measured
    * 487k docs → 126k distinct signatures, band buckets of 8k docs): joining
    * documents directly makes candidate pairs grow ∝ Σ bucket² in DOCUMENT
    * counts (measured super-linear, exponent 1.13 raw — 672M candidate
    * pairs), while every doc in a signature group shares one verify verdict.
    * So: group docs by signature (`sig_id` = the group's min doc_id), band
    * ONLY one representative per distinct signature into the candidate
    * self-join (26× fewer pairs at factor 100), verify hamming on signature
    * pairs, then expand qualifying signature pairs back to doc pairs by two
    * membership equi-joins — output-proportional by construction. Identical-
    * signature pairs (hamming 0) never enter the banded join at all: they
    * expand directly from the membership table keyed by the FULL signature,
    * the only join whose output is inherently quadratic — in the true
    * answer, not in any intermediate. No pairwise scan anywhere.
    */
  def phashNearDup(s: SparkSession, dir: String): DataFrame =
    phashNearDupOf(assets(s, dir))

  /** The aHash+banding core over an explicit (doc_id, payload) frame —
    * factored for fixture tests with constructed near-dup payloads.
    */
  /** Adds `sig` — the full 64-bit aHash signature PACKED into one BIGINT
    * (batch bit i at position 63−i, i.e. band0·2⁴⁸|band1·2³²|band2·2¹⁶|
    * band3) — to an asset frame, dropping sub-[[PhashMinBytes]] assets (no
    * signal). Computed by the native codegen'd
    * [[graft.functions.AhashSig]] expression: one per-row scalar
    * projection — no explode, no window, no shuffle — so it is legal in a
    * streaming plan (which [[graft.streaming.Streaming.phashKeepViaState]]
    * needs, and the earlier posexplode + per-doc window formulation was
    * not) AND stays inside WholeStageCodegen (the interim higher-order-
    * function fold was CodegenFallback, measured 2–4× slower at sf0.1).
    * The oracle keeps the explode/window SQL; both compute the identical
    * exact-integer bits (sample·64 > Σ samples).
    */
  private[graft] def withPhashSig(assetFrame: DataFrame): DataFrame = {
    graft.functions.AhashSig.register(assetFrame.sparkSession)
    assetFrame
      .filter(length(col("payload")) >= PhashMinBytes)
      .withColumn("sig", call_function("ahash_sig", col("payload")))
  }

  /** doc_id → the full 64-bit aHash signature as its 4 packed 16-bit band
    * values in ascending band order — the shared front half of
    * [[phashNearDupOf]] and [[phashDedupOf]], unpacked from
    * [[withPhashSig]]'s one-long form.
    */
  private def phashSignatures(assetFrame: DataFrame): DataFrame =
    withPhashSig(assetFrame).select(col("doc_id"), expr(
      s"transform(sequence(0, 3), b -> CAST(shiftrightunsigned(sig, " +
        s"$PhashBandBits * (3 - b)) & 65535 AS BIGINT))").as("bands"))

  private[graft] def phashNearDupOf(assetFrame: DataFrame): DataFrame = {
    // membership: doc → full signature (4-long array) + its group's sig_id
    // (min doc_id over the signature — dense, stable, gives the group a
    // representative and a total order). Persisted: feeds the hamming-0
    // expansion (twice), the representative table, and the cross-group
    // expansion (twice).
    val mem = phashSignatures(assetFrame)
      .withColumn("sig_id", min(col("doc_id")).over(Window.partitionBy("bands")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // hamming-0 pairs: same full signature — expanded straight from the
    // membership table; the join key is the WHOLE signature, so output rows
    // are exactly the true identical-hash pairs
    val ident = mem.as("x").join(mem.as("y"),
        col("x.sig_id") === col("y.sig_id") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lit(0L).as("hamming"))
    // banded candidate join over one representative per DISTINCT signature
    val reps = mem.filter(col("doc_id") === col("sig_id"))
      .select(col("sig_id"), col("bands"))
    val rb = reps.select(col("sig_id"), col("bands"),
      posexplode(col("bands")).as(Seq("band_idx", "band_val")))
    val qual = rb.as("x").join(rb.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.sig_id") < col("y.sig_id"))
      .select(col("x.sig_id").as("sa"), col("y.sig_id").as("sb"),
        col("x.bands").as("ba"), col("y.bands").as("bb"))
      .distinct() // a pair of signatures can agree on several bands
      .withColumn("hamming", expr(
        "bit_count(ba[0] ^ bb[0]) + bit_count(ba[1] ^ bb[1]) + " +
          "bit_count(ba[2] ^ bb[2]) + bit_count(ba[3] ^ bb[3])"))
      .filter(col("hamming") <= PhashHamT) // ≥ 1 is implicit: sigs differ
      .select(col("sa"), col("sb"), col("hamming"))
    // expand qualifying signature pairs to doc pairs (groups are disjoint,
    // so least/greatest ordering can never collide with ident's pairs)
    val exp = qual
      .join(mem.select(col("sig_id").as("sa"), col("doc_id").as("da")), "sa")
      .join(mem.select(col("sig_id").as("sb"), col("doc_id").as("db")), "sb")
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("hamming"))
    val out = ident.unionByName(exp)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
      .orderBy("doc_a", "doc_b")
    Dedup.materializeThenRelease(out, mem)
  }

  // --------------------------------------------------------- mm_phash_dedup

  /** The asset-dedup TERMINAL: one canonical asset per identical 64-bit
    * aHash signature, with the number of assets it stands for —
    * [[Dedup.exactDedup]]'s keep-list shape lifted from byte-exact
    * fingerprints to perceptual-hash-exact signatures. This is the pass a
    * production media pipeline runs FIRST: the factor-100 probe measured
    * 487k assets collapsing to 126k distinct signatures (the pair list
    * there is inherently ~n² — 14.7M hamming-0 pairs), so the keep-list,
    * not the pair list, is the artifact a 100 TB asset corpus can actually
    * materialize. Assets under [[PhashMinBytes]] carry no signal and are
    * kept as singletons (nothing to merge on). `sum(n_merged)` = asset
    * count by construction.
    *
    * Scale shape: one map-side-partial hash aggregate onto the signature
    * (≤ |distinct sigs| rows), no join, no window, no pair expansion —
    * strictly linear, the terminal [[phashNearDup]] cannot be.
    */
  def phashDedup(s: SparkSession, dir: String): DataFrame =
    phashDedupOf(assets(s, dir))

  private[graft] def phashDedupOf(assetFrame: DataFrame): DataFrame = {
    val winners = phashSignatures(assetFrame)
      .groupBy("bands")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_merged"))
      .select(col("doc_id"), col("n_merged"))
    val singles = assetFrame.filter(length(col("payload")) < PhashMinBytes)
      .select(col("doc_id"), lit(1L).as("n_merged"))
    winners.unionByName(singles).orderBy("doc_id")
  }

  // ---------------------------------------------------------- mm_scene_cut

  /** Scene-cut frame size — smaller than the sampling [[FrameBytes]] so
    * short clips still carry several frames (at 64 bytes the aHash sampler
    * reads EVERY byte: pos_i = i·63/63 = i).
    */
  private[graft] val SceneFrameBytes = 64

  /** Consecutive-frame hamming distance above this ⇒ a new scene (median
    * consecutive-frame hamming on the synthetic corpus is ~19; 20 splits
    * the population rather than degenerating to all-cuts or no-cuts).
    */
  private[graft] val SceneCutThr = 20L

  /** Scene-boundary detection over the video class — the shot-segmentation
    * pass a video corpus runs before per-scene sampling/dedup (a frame
    * sampler that ignores scene structure over-samples long static shots
    * and misses short ones). Per full [[SceneFrameBytes]]-byte frame the native
    * codegen'd `ahash_sig` packs 64 aHash bits into one BIGINT; a cut is a
    * consecutive-frame signature hamming (codegen'd xor+bit_count, the
    * phash verify) above [[SceneCutThr]]; scenes are the running cut-count
    * (the ev_streaks island trick); the rollup reports per-video frames,
    * scenes, longest scene, and mean scene length.
    *
    * Scale shape: the frame fan-out is a generator INSIDE the scan stage;
    * ONE doc_id Exchange feeds both the lag and the running-sum window
    * (same partition + sort), then two stacked map-side-partial hash
    * aggregates collapse to one row per video — no self-join, frame BYTES
    * never shuffle (only the packed BIGINT signature crosses). Trailing
    * partial frames are dropped (sub-frame tails carry no comparable
    * signature), sub-frame videos with them. Regression indicator: a
    * second doc_id exchange between the windows, or the payload column
    * surviving past the signature projection.
    */
  def sceneCut(s: SparkSession, dir: String): DataFrame =
    sceneCutOf(assets(s, dir))

  private[graft] def sceneCutOf(assetFrame: DataFrame): DataFrame = {
    graft.functions.AhashSig.register(assetFrame.sparkSession)
    val fr = assetFrame
      .filter(col("media_type") === "video" &&
        length(col("payload")) >= SceneFrameBytes)
      .select(col("doc_id"), col("payload"),
        posexplode(graft.functions.Exprs.boundedSequence(lit(0),
          expr(s"cast(length(payload) div $SceneFrameBytes as int) - 1")))
          .as(Seq("pos", "frame_idx")))
      .select(col("doc_id"), col("frame_idx"),
        call_function("ahash_sig",
          expr(s"substring(payload, frame_idx * $SceneFrameBytes + 1, $SceneFrameBytes)"))
          .as("sig"))
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    val cuts = fr
      .withColumn("prev", lag("sig", 1).over(w))
      .withColumn("cut",
        when(col("prev").isNotNull &&
          expr("bit_count(sig ^ prev)") > SceneCutThr, 1L).otherwise(0L))
      .withColumn("scene", sum("cut").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cuts.groupBy("doc_id", "scene")
      .agg(count(lit(1)).as("len"))
      .groupBy("doc_id")
      .agg(sum("len").as("n_frames"),
        count(lit(1)).as("n_scenes"),
        max("len").as("longest_scene"))
      .withColumn("avg_scene_len",
        round(col("n_frames").cast("double") / col("n_scenes"), 4))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------- mm_dct_phash

  private[graft] val DctN = 16   // synthesized gray image side (N×N)
  private val DctBlock = 8       // low-frequency block kept (8×8 = 64 bits)
  private val DctScale = 1 << 14 // fixed-point cosine scale
  private val DctHamT = 10       // accept pairs with hamming <= T

  /** Fixed-point DCT-II cosine table C(u)(x) = round(cos(π(2x+1)u / 2N)·2¹⁴)
    * for u < [[DctBlock]], x < [[DctN]] — the ONE table both engines share:
    * the oracle embeds these exact integers as literals, so the whole
    * transform is order-independent long arithmetic on both sides (a
    * floating DCT would hang cross-engine equality on summation order).
    * Magnitude: |pix·Cx·Cy| ≤ 255·2²⁸ and ≤ 2¹⁰ terms ⇒ every partial fits
    * a long with ≥ 13 bits to spare.
    */
  private[graft] val DctCos: Array[Array[Long]] =
    Array.tabulate(DctBlock, DctN) { (u, x) =>
      math.round(math.cos(math.Pi * (2 * x + 1) * u / (2.0 * DctN)) * DctScale)
    }

  /** Separable fixed-point 2-D DCT-II over an N×N gray image → the low
    * [[DctBlock]]² coefficient block → 64 bits packed as 4×16-bit bands.
    * Bit (u·8+v) = [63·F(u,v) > Σ F over the 63 non-DC cells] — the
    * standard pHash mean rule in exact integer form (the DC cell compares
    * too and lands 1 on any non-degenerate image; a constant shared bit,
    * documented rather than special-cased so the oracle is one CASE).
    */
  private[graft] def dctHash64(pix: Array[Int]): Array[Long] = {
    // rows first: G(u,y) = Σx pix(y·N+x)·C(u)(x)
    val g = Array.ofDim[Long](DctBlock, DctN)
    var u = 0
    while (u < DctBlock) {
      var y = 0
      while (y < DctN) {
        var sAcc = 0L
        var x = 0
        while (x < DctN) { sAcc += pix(y * DctN + x) * DctCos(u)(x); x += 1 }
        g(u)(y) = sAcc
        y += 1
      }
      u += 1
    }
    // then columns: F(u,v) = Σy G(u,y)·C(v)(y)
    val f = Array.ofDim[Long](DctBlock, DctBlock)
    var m = 0L
    u = 0
    while (u < DctBlock) {
      var v = 0
      while (v < DctBlock) {
        var sAcc = 0L
        var y = 0
        while (y < DctN) { sAcc += g(u)(y) * DctCos(v)(y); y += 1 }
        f(u)(v) = sAcc
        if (u != 0 || v != 0) m += sAcc
        v += 1
      }
      u += 1
    }
    val bands = new Array[Long](4)
    u = 0
    while (u < DctBlock) {
      var v = 0
      while (v < DctBlock) {
        val i = u * DctBlock + v
        if (63L * f(u)(v) > m) bands(i / 16) |= 1L << (15 - i % 16)
        v += 1
      }
      u += 1
    }
    bands
  }

  /** The REAL pHash [[phashNearDup]]'s scaladoc promises: a 2-D DCT over
    * DECODED netpbm pixels in place of the 1-D byte sampler, every stage
    * after the transform — banding, candidate equi-join, exact hamming
    * verify — the production plumbing unchanged. Each payload is framed as
    * a strict 16×16 P5 blob (body = payload bytes repeated mod-length) and
    * ROUND-TRIPPED through the same [[netpbmHeader]] parser mm_typed_decode
    * uses — the encode→decode path is exercised per row, not faked — then
    * hashed via [[dctHash64]]. On a corpus whose blobs already ARE P5/P6,
    * the synthesis step disappears and [[decodeNetpbmPixels]] feeds the
    * identical plan.
    *
    * Scale shape: the signature is a typed mapPartitions (per-partition
    * codec init amortized, same as [[typedDecode]]) emitting 4 long bands
    * per asset — bytes never shuffle; candidates come ONLY from the
    * (band_idx, band_val) equi-join (pigeonhole-complete to hamming ≤ 3,
    * s-curve recall to [[DctHamT]] — the documented LSH trade), and the
    * hamming verify is codegen'd xor+bit_count over the bounded pair list.
    */
  def dctPhash(s: SparkSession, dir: String): DataFrame =
    dctPhashOf(assets(s, dir))

  private[graft] def dctPhashOf(assetFrame: DataFrame): DataFrame = {
    import assetFrame.sparkSession.implicits._
    val sigs = assetFrame
      .filter(length(col("payload")) > 0)
      .as[MediaAsset]
      .mapPartitions { it =>
        val body = new Array[Byte](DctN * DctN) // per-partition scratch
        it.map { a =>
          var k = 0
          while (k < body.length) { body(k) = a.payload(k % a.payload.length); k += 1 }
          val pix = decodeNetpbmPixels(encodeP5(DctN, DctN, body)).getOrElse(
            throw new IllegalStateException(s"P5 round-trip failed: doc ${a.doc_id}"))
          val b = dctHash64(pix)
          DctSig(a.doc_id, b(0), b(1), b(2), b(3))
        }
      }
    val wide = sigs.toDF()
      .select(col("doc_id"),
        array(col("b0"), col("b1"), col("b2"), col("b3")).as("bands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val long = wide.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_val")))
    val cand = long.as("x").join(long.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val out = cand
      .join(wide.select(col("doc_id").as("doc_a"), col("bands").as("ba")), "doc_a")
      .join(wide.select(col("doc_id").as("doc_b"), col("bands").as("bb")), "doc_b")
      .withColumn("hamming", expr(
        "bit_count(ba[0] ^ bb[0]) + bit_count(ba[1] ^ bb[1]) + " +
          "bit_count(ba[2] ^ bb[2]) + bit_count(ba[3] ^ bb[3])"))
      .filter(col("hamming") <= DctHamT)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
      .orderBy("doc_a", "doc_b")
    Dedup.materializeThenRelease(out, wide)
  }

  // --------------------------------------------------------- mm_wav_energy

  private[graft] val WavRate = 16000 // canonical speech sample rate (Hz)
  private val WavWindow = 160        // samples per energy window (10 ms)
  private val SilenceAmp = 8000L     // mean |amplitude| below this = silence

  /** The audio branch of the decode tier: per-asset energy profile over
    * 16-bit PCM — the VAD-style silence screen a speech-corpus pipeline runs
    * before transcription (mostly-silent clips are the audio analogue of
    * boilerplate text). Each payload is framed as a CANONICAL mono s16le
    * RIFF/WAV blob (samples synthesized from the payload bytes,
    * `(b − 128)·256` — exactly the Short range) and ROUND-TRIPPED through
    * [[wavSamples]], a real chunk-walking RIFF parser — fmt validation,
    * unknown-chunk skipping, odd-size padding — so on a corpus whose blobs
    * already ARE WAV files the synthesis step disappears and the identical
    * plan runs. Per 160-sample (10 ms) full window, the integer energy sum
    * decides silent/loud; the per-doc rollup (windows, silent count, peak,
    * mean |amplitude|) comes straight out of the typed map.
    *
    * Scale shape: one pass per payload inside a typed mapPartitions — the
    * blob bytes never shuffle, the map emits one bounded row per asset, and
    * the only exchange in the plan is the final presentation sort. All
    * window/silence arithmetic is integer (exact cross-engine); the two
    * ratios are derived in Column space so both engines round identically.
    */
  def wavEnergy(s: SparkSession, dir: String): DataFrame =
    wavEnergyOf(assets(s, dir))

  private[graft] def wavEnergyOf(assetFrame: DataFrame): DataFrame = {
    import assetFrame.sparkSession.implicits._
    val raw = assetFrame
      .filter(length(col("payload")) > 0)
      .as[MediaAsset]
      .mapPartitions { it =>
        it.map { a =>
          val synth = new Array[Short](a.payload.length)
          var k = 0
          while (k < synth.length) {
            synth(k) = (((a.payload(k) & 0xff) - 128) * 256).toShort; k += 1
          }
          val (_, smp) = wavSamples(encodeWav(WavRate, synth)).getOrElse(
            throw new IllegalStateException(s"WAV round-trip failed: doc ${a.doc_id}"))
          val nWin = smp.length / WavWindow
          var sumAbs = 0L; var peak = 0L; var nSilent = 0L; var wsum = 0L
          k = 0
          while (k < smp.length) {
            val amp = math.abs(smp(k).toLong)
            sumAbs += amp
            if (amp > peak) peak = amp
            if (k < nWin * WavWindow) {
              wsum += amp
              if ((k + 1) % WavWindow == 0) {
                if (wsum < SilenceAmp * WavWindow) nSilent += 1
                wsum = 0L
              }
            }
            k += 1
          }
          (a.doc_id, smp.length.toLong, nWin.toLong, nSilent, sumAbs, peak)
        }
      }
      .toDF("doc_id", "n_samples", "n_windows", "n_silent", "sum_abs", "peak_amp")
    raw.select(col("doc_id"), col("n_samples"), col("n_windows"), col("n_silent"),
        when(col("n_windows") === 0, lit(0.0))
          .otherwise(round(col("n_silent").cast("double") / col("n_windows"), 6))
          .as("silence_ratio"),
        col("peak_amp"),
        round(col("sum_abs").cast("double") / col("n_samples"), 6).as("mean_abs"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------- mm_wav_vad

  private[graft] val VadWindow = 40 // samples per VAD window (2.5 ms @ 16 kHz)
  private val VadAmp = 8000L        // window mean |amplitude| at/above = active
  private val VadMaxGap = 1         // silent windows bridged inside a segment

  /** Energy-gated voice-activity segmentation — the step after the
    * [[wavEnergy]] silence screen in every speech-corpus pipeline: turn
    * per-window activity into SEGMENTS (utterance spans an ASR stage
    * transcribes one at a time), with a hangover that bridges up to
    * [[VadMaxGap]] silent windows so a plosive gap doesn't split an
    * utterance. Two active windows belong to one segment iff their indices
    * differ by ≤ [[VadMaxGap]]+1; a segment's span runs first-active to
    * last-active inclusive (bridged silence counts — it will be fed to the
    * recognizer). Emits per asset the window/active counts, segment count,
    * the longest segment's span and start (ties to the earliest; −1 when
    * no activity), and the active ratio.
    *
    * Same strict RIFF round-trip as [[wavEnergy]]: payloads frame as
    * canonical mono s16le blobs through `encodeWav`/`wavSamples`, so on a
    * corpus of real WAV files the synthesis disappears and the identical
    * plan runs. The 40-sample window (vs the energy screen's 160) keeps
    * several windows per fixture asset so segment structure is exercised,
    * and the whole segment walk is one sequential pass INSIDE the typed
    * map — per-asset state is four counters, never a per-window row set.
    *
    * Scale shape: one typed mapPartitions pass, blob bytes never shuffle,
    * one bounded row per asset; the only exchange is the presentation
    * sort. All gating/bridging arithmetic is integer — exact cross-engine.
    */
  def wavVad(s: SparkSession, dir: String): DataFrame =
    wavVadOf(assets(s, dir))

  private[graft] def wavVadOf(assetFrame: DataFrame): DataFrame = {
    import assetFrame.sparkSession.implicits._
    val raw = assetFrame
      .filter(length(col("payload")) > 0)
      .as[MediaAsset]
      .mapPartitions { it =>
        it.map { a =>
          val synth = new Array[Short](a.payload.length)
          var k = 0
          while (k < synth.length) {
            synth(k) = (((a.payload(k) & 0xff) - 128) * 256).toShort; k += 1
          }
          val (_, smp) = wavSamples(encodeWav(WavRate, synth)).getOrElse(
            throw new IllegalStateException(s"WAV round-trip failed: doc ${a.doc_id}"))
          val nWin = smp.length / VadWindow
          var nActive = 0L; var nSeg = 0L
          var curStart = -1L; var lastActive = -1L
          var bestSpan = 0L; var bestStart = -1L
          var w = 0
          while (w < nWin) {
            var wsum = 0L
            var i = w * VadWindow
            val end = i + VadWindow
            while (i < end) { wsum += math.abs(smp(i).toLong); i += 1 }
            if (wsum >= VadAmp * VadWindow) {
              nActive += 1
              if (lastActive < 0 || w - lastActive > VadMaxGap + 1) {
                nSeg += 1; curStart = w
              }
              val span = w - curStart + 1
              if (span > bestSpan) { bestSpan = span; bestStart = curStart }
              lastActive = w
            }
            w += 1
          }
          (a.doc_id, nWin.toLong, nActive, nSeg, bestSpan, bestStart)
        }
      }
      .toDF("doc_id", "n_windows", "n_active", "n_segments",
        "longest_span", "longest_start")
    raw.select(col("doc_id"), col("n_windows"), col("n_active"),
        col("n_segments"), col("longest_span"), col("longest_start"),
        when(col("n_windows") === 0, lit(0.0))
          .otherwise(round(col("n_active").cast("double") / col("n_windows"), 6))
          .as("active_ratio"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------ mm_wav_downsample

  /** Decimation factor — the 48 kHz → 16 kHz resample every ASR pipeline
    * runs before transcription.
    */
  private[graft] val WavDecim = 3

  /** Audio downsample screen — each output sample is the TRUNCATING
    * integer mean of [[WavDecim]] consecutive input samples (Σ/3 toward
    * zero: Java `/` here, DuckDB `//` in the oracle — both truncate; a
    * floor divide would diverge on negative odd sums, which the fixture
    * pins), trailing partial groups dropped.
    * Emits per asset the in/out sample counts, output peak, and mean
    * |amplitude| on both sides — the "did the resample clip or smear"
    * audit a speech pipeline logs. Same strict RIFF round-trip as
    * [[wavEnergy]]: payloads frame as canonical mono s16le blobs through
    * `encodeWav`/`wavSamples`, so on a corpus of real WAV files the
    * synthesis disappears and the identical plan runs.
    *
    * Scale shape: one typed mapPartitions pass, blob bytes never shuffle,
    * one bounded row per asset; the only exchange is the presentation
    * sort.
    */
  def wavDownsample(s: SparkSession, dir: String): DataFrame =
    wavDownsampleOf(assets(s, dir))

  private[graft] def wavDownsampleOf(assetFrame: DataFrame): DataFrame = {
    import assetFrame.sparkSession.implicits._
    val raw = assetFrame
      .filter(length(col("payload")) > 0)
      .as[MediaAsset]
      .mapPartitions { it =>
        it.map { a =>
          val synth = new Array[Short](a.payload.length)
          var k = 0
          while (k < synth.length) {
            synth(k) = (((a.payload(k) & 0xff) - 128) * 256).toShort; k += 1
          }
          val (_, smp) = wavSamples(encodeWav(WavRate, synth)).getOrElse(
            throw new IllegalStateException(s"WAV round-trip failed: doc ${a.doc_id}"))
          val nOut = smp.length / WavDecim
          var sumIn = 0L; var sumOut = 0L; var peakOut = 0L
          k = 0
          while (k < smp.length) { sumIn += math.abs(smp(k).toLong); k += 1 }
          var j = 0
          while (j < nOut) {
            val s3 = smp(WavDecim * j) + smp(WavDecim * j + 1) + smp(WavDecim * j + 2)
            val ad = math.abs((s3 / WavDecim).toLong)
            sumOut += ad
            if (ad > peakOut) peakOut = ad
            j += 1
          }
          (a.doc_id, smp.length.toLong, nOut.toLong, sumOut, peakOut, sumIn)
        }
      }
      .toDF("doc_id", "n_in", "n_out", "sum_abs_out", "peak_out", "sum_abs_in")
    raw.select(col("doc_id"), col("n_in"), col("n_out"), col("peak_out"),
        round(col("sum_abs_in").cast("double") / col("n_in"), 6).as("mean_abs_in"),
        when(col("n_out") === 0, lit(0.0)).otherwise(
          round(col("sum_abs_out").cast("double") / col("n_out"), 6))
          .as("mean_abs_out"))
      .orderBy("doc_id")
  }

  /** Minimal canonical mono 16-bit PCM WAV encoder — RIFF/WAVE with a
    * 16-byte fmt chunk, a deliberately-present LIST/INFO junk chunk (so the
    * parser's chunk walk is exercised on every blob, never an offset-44
    * assumption), then the s16le data chunk.
    */
  private[graft] def encodeWav(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataBytes = 2 * samples.length
    val out = new Array[Byte](56 + dataBytes) // 12 riff + 24 fmt + 12 list + 8 data
    var i = 0
    def ascii(s: String): Unit = { s.foreach { c => out(i) = c.toByte; i += 1 } }
    def u32(v: Long): Unit = { var b = 0; while (b < 4) { out(i) = ((v >> (8 * b)) & 0xff).toByte; i += 1; b += 1 } }
    def u16(v: Int): Unit = { out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte; i += 2 }
    ascii("RIFF"); u32(48L + dataBytes); ascii("WAVE")
    ascii("fmt "); u32(16); u16(1); u16(1); u32(rate.toLong); u32(2L * rate); u16(2); u16(16)
    ascii("LIST"); u32(4); ascii("INFO")
    ascii("data"); u32(dataBytes.toLong)
    var k = 0
    while (k < samples.length) {
      out(i) = (samples(k) & 0xff).toByte; out(i + 1) = ((samples(k) >> 8) & 0xff).toByte
      i += 2; k += 1
    }
    out
  }

  /** Strict RIFF/WAV parse (public container spec, pure-JVM): 'RIFF' +
    * exact riff size + 'WAVE', then a real chunk walk — 4-byte id, u32le
    * size, content, one pad byte after odd-size chunks — collecting the fmt
    * chunk (required: PCM format 1, mono, 16-bit) and the data chunk, and
    * skipping anything else (LIST, fact, cue…). Returns
    * Some((sampleRate, s16le samples)) iff the blob is a complete valid
    * mono-PCM16 WAV; anything else — truncated body, stereo, float PCM, a
    * size field past the payload — is None, so a blob that merely starts
    * with 'RIFF' can never be misparsed.
    */
  private[graft] def wavSamples(p: Array[Byte]): Option[(Int, Array[Short])] = {
    def u32(off: Int): Long =
      (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
        ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
    def u16(off: Int): Int = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
    def tag(off: Int): String = new String(p, off, 4, "US-ASCII")
    if (p.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    if (u32(4) != p.length - 8L) return None
    var i = 12
    var rate = -1
    var dataOff = -1; var dataLen = -1
    while (i + 8 <= p.length) {
      val id = tag(i); val size = u32(i + 4)
      if (i + 8 + size > p.length) return None // chunk body must be complete
      if (id == "fmt ") {
        if (size < 16) return None
        val fmt = u16(i + 8); val nch = u16(i + 10); val bits = u16(i + 22)
        if (fmt != 1 || nch != 1 || bits != 16) return None
        rate = u32(i + 12).toInt
      } else if (id == "data") {
        if (size % 2 != 0) return None
        dataOff = i + 8; dataLen = size.toInt
      }
      i += 8 + size.toInt + (size.toInt & 1) // odd-size chunks carry a pad byte
    }
    if (i != p.length) return None // trailing garbage → not a valid container
    if (rate <= 0 || dataOff < 0) return None
    val smp = new Array[Short](dataLen / 2)
    var k = 0
    while (k < smp.length) {
      smp(k) = ((p(dataOff + 2 * k) & 0xff) | (p(dataOff + 2 * k + 1) << 8)).toShort
      k += 1
    }
    Some((rate, smp))
  }

  // --------------------------------------------------------- mm_png_decode

  private[graft] val PngN = 16 // synthesized image side (N×N)

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def pngChannels(colorType: Int): Int = colorType match {
    case 0 => 1 // 8-bit grayscale
    case 2 => 3 // 8-bit RGB
    case 6 => 4 // 8-bit RGBA
    case _ => -1
  }

  /** Paeth predictor (PNG filter type 4) — nearest of left/up/up-left to
    * `left + up − upleft`, ties broken left, up, up-left (the spec order).
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Real PNG encoder for the three 8-bit non-interlaced color types the
    * decoder accepts — signature, IHDR/IDAT/IEND chunks with genuine CRC32s,
    * zlib-deflated scanlines. Each row is FORWARD-filtered with filter type
    * `row % 5`, so one ≥5-row image exercises every PNG filter (None, Sub,
    * Up, Average, Paeth) and any unfilter bug in the decoder breaks the
    * byte-exact round-trip rather than hiding behind filter-0 data.
    */
  private[graft] def encodePng(w: Int, h: Int, colorType: Int,
      raw: Array[Byte]): Array[Byte] = {
    val ch = pngChannels(colorType)
    require(ch > 0, s"unsupported color type $colorType")
    require(raw.length == w * h * ch, "raw must be exactly w*h*channels samples")
    val stride = w * ch
    val filtered = new Array[Byte](h * (1 + stride))
    var r = 0
    while (r < h) {
      val t = r % 5
      filtered(r * (1 + stride)) = t.toByte
      var i = 0
      while (i < stride) {
        val x = raw(r * stride + i) & 0xff
        val left = if (i >= ch) raw(r * stride + i - ch) & 0xff else 0
        val up = if (r > 0) raw((r - 1) * stride + i) & 0xff else 0
        val ul = if (r > 0 && i >= ch) raw((r - 1) * stride + i - ch) & 0xff else 0
        val pred = t match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        filtered(r * (1 + stride) + 1 + i) = ((x - pred) & 0xff).toByte
        i += 1
      }
      r += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered)
    defl.finish()
    val idatBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!defl.finished()) idatBuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val ihdr = new Array[Byte](13)
    def be32(buf: Array[Byte], off: Int, v: Int): Unit = {
      buf(off) = (v >>> 24).toByte; buf(off + 1) = (v >>> 16).toByte
      buf(off + 2) = (v >>> 8).toByte; buf(off + 3) = v.toByte
    }
    be32(ihdr, 0, w); be32(ihdr, 4, h)
    ihdr(8) = 8; ihdr(9) = colorType.toByte // depth 8; comp/filter/interlace 0
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val lenBuf = new Array[Byte](4); be32(lenBuf, 0, data.length)
      out.write(lenBuf)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      val crcBuf = new Array[Byte](4); be32(crcBuf, 0, crc.getValue.toInt)
      out.write(crcBuf)
    }
    chunk("IHDR", ihdr)
    chunk("IDAT", idatBuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Strict PNG decoder — the real-codec branch of the decode tier (the
    * r15 verdict's "no real-world codec" gap): 8-bit non-interlaced
    * grayscale/RGB/RGBA, pure `java.util.zip` (public knowledge, zero new
    * deps). Strictness mirrors [[netpbmHeader]]: signature, CRC32 validated
    * on EVERY chunk (ancillary ones included), exactly one IHDR first,
    * IDAT concatenation inflated to EXACTLY h·(1+w·ch) bytes (truncated or
    * trailing-garbage streams rejected), all five scanline filters
    * reversed. Returns (w, h, colorType, unfiltered samples row-major,
    * channels interleaved) or None — a blob that merely starts with the
    * 8-byte signature can never be misparsed into garbage means.
    *
    * The Inflater is CALLER-owned: one instance per partition, reset per
    * row — the per-partition codec-init slot [[typedDecodeOf]] documents.
    */
  private[graft] def decodePng(p: Array[Byte],
      inf: java.util.zip.Inflater): Option[(Int, Int, Int, Array[Byte])] = {
    if (p.length < PngSig.length) return None
    var i = 0
    while (i < PngSig.length) { if (p(i) != PngSig(i)) return None; i += 1 }
    def be32(off: Int): Long =
      ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
        ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)
    var w = 0; var h = 0; var ct = -1
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new java.util.zip.CRC32()
    while (i + 12 <= p.length && !seenIend) {
      val len = be32(i)
      if (len > Int.MaxValue - 12 || i + 12 + len > p.length) return None
      val n = len.toInt
      val typ = new String(p, i + 4, 4, "US-ASCII")
      crc.reset()
      crc.update(p, i + 4, 4 + n)
      if (crc.getValue != be32(i + 8 + n)) return None // strict: every chunk
      typ match {
        case "IHDR" =>
          if (seenIhdr || n != 13) return None
          w = be32(i + 8).toInt; h = be32(i + 12).toInt
          ct = p(i + 17) & 0xff
          if (w <= 0 || h <= 0 || p(i + 16) != 8 || pngChannels(ct) < 0 ||
            p(i + 18) != 0 || p(i + 19) != 0 || p(i + 20) != 0) return None
          seenIhdr = true
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(p, i + 8, n)
        case "IEND" =>
          if (n != 0) return None
          seenIend = true
        case _ => () // ancillary chunks skipped (CRC still enforced above)
      }
      i += 12 + n
    }
    if (!seenIhdr || !seenIend || i != p.length) return None
    val ch = pngChannels(ct)
    val stride = w * ch
    if (h.toLong * (1 + stride) > Int.MaxValue) return None
    val expLen = h * (1 + stride)
    val flt = new Array[Byte](expLen)
    inf.reset()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < expLen && !inf.finished()) {
        val k = inf.inflate(flt, got, expLen - got)
        if (k == 0 && inf.needsInput()) return None // truncated stream
        got += k
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    if (got != expLen || !inf.finished()) return None // inexact → reject
    val raw = new Array[Byte](h * stride)
    var r = 0
    while (r < h) {
      val t = flt(r * (1 + stride)) & 0xff
      if (t > 4) return None
      var j = 0
      while (j < stride) {
        val f = flt(r * (1 + stride) + 1 + j) & 0xff
        val left = if (j >= ch) raw(r * stride + j - ch) & 0xff else 0
        val up = if (r > 0) raw((r - 1) * stride + j) & 0xff else 0
        val ul = if (r > 0 && j >= ch) raw((r - 1) * stride + j - ch) & 0xff else 0
        val pred = t match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(r * stride + j) = ((f + pred) & 0xff).toByte
        j += 1
      }
      r += 1
    }
    Some((w, h, ct, raw))
  }

  /** PNG decode over the asset battery: each payload's bytes are cycled
    * into a [[PngN]]² sample body, framed as a REAL PNG (color type by
    * media lane: image → RGB, video → RGBA, audio/text → grayscale) and
    * round-tripped through [[decodePng]] — CRC validation, zlib inflate
    * and filter reversal are exercised per row, not faked — then reduced
    * to exact-integer per-channel means. On a corpus whose blobs already
    * ARE PNGs the synthesis step disappears and the identical plan runs.
    *
    * Scale shape: one typed mapPartitions with per-partition codec init
    * (the Inflater), blob bytes never shuffle, output is a fixed 10-column
    * row per asset.
    */
  def pngDecode(s: SparkSession, dir: String): DataFrame =
    pngDecodeOf(assets(s, dir))

  private[graft] def pngDecodeOf(assetFrame: DataFrame): DataFrame = {
    import assetFrame.sparkSession.implicits._
    assetFrame
      .filter(length(col("payload")) > 0)
      .as[MediaAsset]
      .mapPartitions { it =>
        val inf = new java.util.zip.Inflater() // per-partition codec init
        it.map { a =>
          val ct = a.media_type match {
            case "image" => 2
            case "video" => 6
            case _ => 0
          }
          val ch = pngChannels(ct)
          val body = new Array[Byte](PngN * PngN * ch)
          var k = 0
          while (k < body.length) { body(k) = a.payload(k % a.payload.length); k += 1 }
          val png = encodePng(PngN, PngN, ct, body)
          val (w, h, ct2, raw) = decodePng(png, inf).getOrElse(
            throw new IllegalStateException(s"PNG round-trip failed: doc ${a.doc_id}"))
          val sums = new Array[Long](4)
          var j = 0
          while (j < raw.length) { sums(j % ch) += raw(j) & 0xff; j += 1 }
          val n = w.toLong * h
          PngDecoded(a.doc_id, a.media_type, w, h, ct2, ch, png.length,
            sums(0).toDouble / n,
            if (ch >= 3) sums(1).toDouble / n else 0.0,
            if (ch >= 3) sums(2).toDouble / n else 0.0,
            if (ch == 4) sums(3).toDouble / n else 0.0)
        }
      }
      .toDF()
      .withColumn("ch0_mean", round(col("ch0_mean"), 6))
      .withColumn("ch1_mean", round(col("ch1_mean"), 6))
      .withColumn("ch2_mean", round(col("ch2_mean"), 6))
      .withColumn("alpha_mean", round(col("alpha_mean"), 6))
      // png_bytes is engine-only evidence (Deflater output size is not
      // SQL-recomputable); the oracle checks everything else, so the
      // column is dropped rather than weakening the hash gate
      .drop("png_bytes")
      .orderBy("doc_id")
  }

  // -------------------------------------------------------- mm_jpeg_decode

  private[graft] val JpegN = 16 // synthesized image side (N×N = one 4:2:0 MCU)

  /** |decoded − source| channel-mean tolerance for the within_tol gate.
    * The error budget is DC quantization (≤ q00/16 ≈ 0.25 gray levels at
    * quality 90) + chroma box-downsampling on the 4:2:0 lane + the two
    * rounded color transforms — comfortably under 3 on any input.
    */
  private[graft] val JpegTol = 3.0

  private val ZigzagOrder: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ITU T.81 Annex K base quantization tables (natural row-major order)
  private val QBaseLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99)
  private val QBaseChrom: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99)

  private[graft] val JpegQuality = 90

  /** IJG quality scaling of a base table (the libjpeg formula — public). */
  private def scaledQ(base: Array[Int]): Array[Int] = {
    val scale = if (JpegQuality < 50) 5000 / JpegQuality else 200 - 2 * JpegQuality
    base.map(b => math.max(1, math.min(255, (b * scale + 50) / 100)))
  }

  // ITU T.81 Annex K typical Huffman tables: (bits per code length 1..16, values)
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChromBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChromBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** cos((2x+1)·u·π/16) — shared by the encoder's FDCT and decoder's IDCT.
    * Plain doubles: JDK ≥ 15 floating point is always strict, so the codec
    * is bit-deterministic across JVMs (cross-ENGINE parity is handled by
    * the within_tol gate, never by comparing decoded samples in SQL).
    */
  private val JCos: Array[Array[Double]] = Array.tabulate(8, 8)((u, x) =>
    math.cos((2 * x + 1) * u * math.Pi / 16))
  private val JC: Array[Double] = Array.tabulate(8)(u =>
    if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Canonical Huffman code assignment from a (bits, vals) spec —
    * value → (code, length).
    */
  private def huffEncodeTable(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    for (l <- 1 to 16) {
      var i = 0
      while (i < bits(l)) {
        table(vals(k) & 0xff) = (code, l)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    table
  }

  /** MSB-first bit writer with JPEG byte stuffing (0xFF → 0xFF 0x00). */
  private final class JBitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { put(0x7f, 8 - nbits) } // pad with 1s
  }

  /** Baseline-sequential JPEG encoder (ITU T.81 — public knowledge, zero
    * deps): 8-bit, Annex-K quant (IJG quality scaling) + typical Huffman
    * tables, JFIF color transform, interleaved single scan. `subsample`
    * selects 4:2:0 (Y 2×2, box-averaged chroma) vs 4:4:4; `planes` is
    * 1 (gray) or 3 (RGB interleaved in `raw`). Exists to frame synthesized
    * bodies as REAL compressed blobs the decoder must huffman-decode,
    * dequantize and inverse-transform — and as the fixture builder.
    */
  private[graft] def encodeJpeg(w: Int, h: Int, planes: Int, subsample: Boolean,
      raw: Array[Byte]): Array[Byte] = {
    require(planes == 1 || planes == 3, "planes must be 1 or 3")
    require(raw.length == w * h * planes, "raw must be w*h*planes samples")
    val qLum = scaledQ(QBaseLum)
    val qChrom = scaledQ(QBaseChrom)
    // color transform → per-component planes
    val nComp = planes
    val comps: Array[Array[Int]] = if (planes == 1) {
      Array(raw.map(_ & 0xff))
    } else {
      val y = new Array[Int](w * h); val cb = new Array[Int](w * h)
      val cr = new Array[Int](w * h)
      var i = 0
      while (i < w * h) {
        val r = raw(3 * i) & 0xff; val g = raw(3 * i + 1) & 0xff
        val b = raw(3 * i + 2) & 0xff
        def cl(d: Double): Int = math.max(0, math.min(255, math.rint(d).toInt))
        y(i) = cl(0.299 * r + 0.587 * g + 0.114 * b)
        cb(i) = cl(-0.168736 * r - 0.331264 * g + 0.5 * b + 128)
        cr(i) = cl(0.5 * r - 0.418688 * g - 0.081312 * b + 128)
        i += 1
      }
      Array(y, cb, cr)
    }
    val hv: Array[(Int, Int)] =
      if (planes == 3 && subsample) Array((2, 2), (1, 1), (1, 1))
      else Array.fill(nComp)((1, 1))
    val (hmax, vmax) = (hv.map(_._1).max, hv.map(_._2).max)
    // component planes at their own resolution (box-average downsample)
    val planesC: Array[Array[Int]] = (0 until nComp).map { c =>
      val (hc, vc) = hv(c)
      val cw = (w * hc + hmax - 1) / hmax; val chh = (h * vc + vmax - 1) / vmax
      if (hc == hmax && vc == vmax) comps(c)
      else {
        val fx = hmax / hc; val fy = vmax / vc
        val p = new Array[Int](cw * chh)
        var yy = 0
        while (yy < chh) {
          var xx = 0
          while (xx < cw) {
            var s = 0; var n = 0
            var dy = 0
            while (dy < fy) {
              var dx = 0
              while (dx < fx) {
                val sx = xx * fx + dx; val sy = yy * fy + dy
                if (sx < w && sy < h) { s += comps(c)(sy * w + sx); n += 1 }
                dx += 1
              }
              dy += 1
            }
            p(yy * cw + xx) = math.rint(s.toDouble / math.max(n, 1)).toInt
            xx += 1
          }
          yy += 1
        }
        p
      }
    }.toArray
    // FDCT + quantize one 8×8 block at (bx, by) of component c
    def block(c: Int, bx: Int, by: Int): Array[Int] = {
      val (hc, vc) = hv(c)
      val cw = (w * hc + hmax - 1) / hmax; val chh = (h * vc + vmax - 1) / vmax
      val q = if (c == 0) qLum else qChrom
      val f = new Array[Double](64)
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          val sx = math.min(bx * 8 + xx, cw - 1) // edge-replicate padding
          val sy = math.min(by * 8 + yy, chh - 1)
          f(yy * 8 + xx) = planesC(c)(sy * cw + sx) - 128.0
          xx += 1
        }
        yy += 1
      }
      val coef = new Array[Int](64)
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var s = 0.0
          var x = 0
          while (x < 8) {
            var y2 = 0
            while (y2 < 8) {
              s += f(y2 * 8 + x) * JCos(u)(x) * JCos(v)(y2)
              y2 += 1
            }
            x += 1
          }
          val fc = 0.25 * JC(u) * JC(v) * s
          coef(v * 8 + u) = math.rint(fc / q(v * 8 + u)).toInt
          v += 1
        }
        u += 1
      }
      coef
    }
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >>> 8); out.write(len & 0xff)
      body.foreach(b => out.write(b & 0xff))
    }
    marker(0xd8) // SOI
    seg(0xe0, Array(0x4a, 0x46, 0x49, 0x46, 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0 JFIF
    seg(0xdb, 0 +: (0 until 64).map(i => qLum(ZigzagOrder(i))).toArray) // DQT 0
    if (nComp == 3)
      seg(0xdb, 1 +: (0 until 64).map(i => qChrom(ZigzagOrder(i))).toArray)
    // SOF0
    seg(0xc0, Array(8, h >>> 8, h & 0xff, w >>> 8, w & 0xff, nComp) ++
      (0 until nComp).flatMap(c =>
        Seq(c + 1, (hv(c)._1 << 4) | hv(c)._2, if (c == 0) 0 else 1)))
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Unit =
      seg(0xc4, Array((tc << 4) | th) ++ (1 to 16).map(bits) ++ vals.map(_ & 0xff))
    dht(0, 0, DcLumBits, DcLumVals); dht(1, 0, AcLumBits, AcLumVals)
    if (nComp == 3) {
      dht(0, 1, DcChromBits, DcChromVals); dht(1, 1, AcChromBits, AcChromVals)
    }
    // SOS
    seg(0xda, Array(nComp) ++
      (0 until nComp).flatMap(c => Seq(c + 1, if (c == 0) 0x00 else 0x11)) ++
      Array(0, 63, 0))
    val dcT = Array(huffEncodeTable(DcLumBits, DcLumVals),
      huffEncodeTable(DcChromBits, DcChromVals))
    val acT = Array(huffEncodeTable(AcLumBits, AcLumVals),
      huffEncodeTable(AcChromBits, AcChromVals))
    val bw = new JBitWriter(out)
    val dcPred = new Array[Int](nComp)
    def emit(c: Int, coef: Array[Int]): Unit = {
      val t = if (c == 0) 0 else 1
      def size(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))
      def bitsOf(v: Int, s: Int): Int = if (v >= 0) v else v + (1 << s) - 1
      val diff = coef(0) - dcPred(c)
      dcPred(c) = coef(0)
      val ds = size(diff)
      val (dc, dl) = dcT(t)(ds)
      bw.put(dc, dl)
      if (ds > 0) bw.put(bitsOf(diff, ds), ds)
      var k = 1
      var run = 0
      while (k < 64) {
        val v = coef(ZigzagOrder(k))
        if (v == 0) run += 1
        else {
          while (run > 15) { val (zc, zl) = acT(t)(0xf0); bw.put(zc, zl); run -= 16 }
          val s = size(v)
          val (ac, al) = acT(t)((run << 4) | s)
          bw.put(ac, al)
          bw.put(bitsOf(v, s), s)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (ec, el) = acT(t)(0x00); bw.put(ec, el) }
    }
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var c = 0
        while (c < nComp) {
          val (hc, vc) = hv(c)
          var by = 0
          while (by < vc) {
            var bx = 0
            while (bx < hc) {
              emit(c, block(c, mx * hc + bx, my * vc + by))
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Huffman DECODE tables: canonical mincode/maxcode/valptr (T.81 F.2.2.3). */
  private final class JHuffTable(bits: Array[Int], vals: Array[Byte]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (l <- 1 to 16) {
        valptr(l) = k
        mincode(l) = code
        maxcode(l) = if (bits(l) > 0) code + bits(l) - 1 else -1
        code = (code + bits(l)) << 1
        k += bits(l)
      }
    }
    def value(l: Int, code: Int): Int = vals(valptr(l) + code - mincode(l)) & 0xff
  }

  /** Strict baseline-sequential JPEG decoder — the second real-world codec
    * branch beside [[decodePng]] (the r16 verdict's item 6): 8-bit
    * huffman-coded DCT, sampling factors 1–2 (4:4:4 / 4:2:0 and their
    * mixes), gray or YCbCr. STRICTNESS contract, mirroring the PNG
    * decoder's: any non-SOF0 frame (progressive SOF2, arithmetic SOF9–11,
    * lossless, 12-bit), 16-bit quant tables, restart intervals, multi-scan
    * files, huffman garbage, truncated scans, inter-MCU marker noise or
    * trailing bytes after EOI → None, never a garbage decode. Returns
    * (w, h, nComponents, samples channel-interleaved at full resolution,
    * chroma upsampled by replication, JFIF inverse color transform).
    */
  private[graft] def decodeJpeg(p: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
    var i = 2
    def u8(off: Int): Int = p(off) & 0xff
    def u16(off: Int): Int = (u8(off) << 8) | u8(off + 1)
    val qt = new Array[Array[Int]](4)
    val dcTabs = new Array[JHuffTable](4)
    val acTabs = new Array[JHuffTable](4)
    var w = 0; var h = 0; var nComp = 0
    var compHv: Array[(Int, Int)] = null
    var compQ: Array[Int] = null
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null
    var sofSeen = false
    var sosAt = -1
    while (sosAt < 0) {
      if (i + 4 > p.length || u8(i) != 0xff) return None
      val m = u8(i + 1)
      if (m == 0xd8 || m == 0xd9 || (m >= 0xd0 && m <= 0xd7)) return None
      val len = u16(i + 2)
      if (len < 2 || i + 2 + len > p.length) return None
      val body = i + 4
      val bodyLen = len - 2
      m match {
        case 0xdb => // DQT: one or more tables
          var j = body
          while (j < body + bodyLen) {
            val pq = u8(j) >> 4; val tq = u8(j) & 0x0f
            if (pq != 0 || tq > 3 || j + 65 > body + bodyLen) return None // 8-bit only
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(ZigzagOrder(k)) = u8(j + 1 + k); k += 1 }
            qt(tq) = t
            j += 65
          }
        case 0xc0 => // SOF0: baseline sequential
          if (sofSeen || bodyLen < 6) return None
          if (u8(body) != 8) return None // 8-bit precision only
          h = u16(body + 1); w = u16(body + 3)
          nComp = u8(body + 5)
          if (w <= 0 || h <= 0 || (nComp != 1 && nComp != 3)) return None
          if (bodyLen != 6 + 3 * nComp) return None
          compHv = new Array[(Int, Int)](nComp)
          compQ = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            val hc = u8(body + 7 + 3 * c) >> 4; val vc = u8(body + 7 + 3 * c) & 0x0f
            if (hc < 1 || hc > 2 || vc < 1 || vc > 2) return None
            compHv(c) = (hc, vc)
            compQ(c) = u8(body + 8 + 3 * c)
            if (compQ(c) > 3) return None
            c += 1
          }
          sofSeen = true
        case mm if (mm >= 0xc1 && mm <= 0xcf) && mm != 0xc4 =>
          return None // progressive/arithmetic/lossless/12-bit frames rejected
        case 0xc4 => // DHT: one or more tables
          var j = body
          while (j < body + bodyLen) {
            val tc = u8(j) >> 4; val th = u8(j) & 0x0f
            if (tc > 1 || th > 3) return None
            val bits = new Array[Int](17)
            var tot = 0
            var l = 1
            while (l <= 16) { bits(l) = u8(j + l); tot += bits(l); l += 1 }
            if (j + 17 + tot > body + bodyLen) return None
            val vals = new Array[Byte](tot)
            System.arraycopy(p, j + 17, vals, 0, tot)
            val tab = new JHuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
            j += 17 + tot
          }
        case 0xdd => return None // restart intervals: strictly rejected
        case 0xda => // SOS: must cover all components in one scan
          if (!sofSeen || bodyLen < 4) return None
          val ns = u8(body)
          if (ns != nComp || bodyLen != 4 + 2 * ns) return None
          compDc = new Array[Int](nComp)
          compAc = new Array[Int](nComp)
          var c = 0
          while (c < ns) {
            val cs = u8(body + 1 + 2 * c)
            if (cs != c + 1) return None // encoder-order component ids
            compDc(c) = u8(body + 2 + 2 * c) >> 4
            compAc(c) = u8(body + 2 + 2 * c) & 0x0f
            if (compDc(c) > 3 || compAc(c) > 3) return None
            c += 1
          }
          if (u8(body + 1 + 2 * ns) != 0 || u8(body + 2 + 2 * ns) != 63 ||
            u8(body + 3 + 2 * ns) != 0) return None // full-spectral baseline
          sosAt = body + bodyLen
        case mm if (mm >= 0xe0 && mm <= 0xef) || mm == 0xfe => () // APPn/COM
        case _ => return None
      }
      i += 2 + len
    }
    // validate referenced tables exist
    var c = 0
    while (c < nComp) {
      if (qt(compQ(c)) == null || dcTabs(compDc(c)) == null ||
        acTabs(compAc(c)) == null) return None
      c += 1
    }
    val (hmax, vmax) = (compHv.map(_._1).max, compHv.map(_._2).max)
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // entropy-coded bit reader with unstuffing; any real marker → fail
    var pos = sosAt
    var acc = 0; var nbits = 0
    var bad = false
    def nextBit(): Int = {
      if (nbits == 0) {
        if (pos >= p.length) { bad = true; return 0 }
        var b = u8(pos); pos += 1
        if (b == 0xff) {
          if (pos >= p.length) { bad = true; return 0 }
          val b2 = u8(pos); pos += 1
          if (b2 != 0x00) { bad = true; return 0 } // marker mid-scan
          b = 0xff
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def huffDec(t: JHuffTable): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        code = (code << 1) | nextBit()
        if (bad) return -1
        if (t.maxcode(l) >= 0 && code <= t.maxcode(l) && code >= t.mincode(l))
          return t.value(l, code)
        l += 1
      }
      bad = true; -1
    }
    def receive(s: Int): Int = {
      var v = 0
      var k = 0
      while (k < s) { v = (v << 1) | nextBit(); k += 1 }
      v
    }
    def extend(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    val planes = (0 until nComp).map { c =>
      new Array[Int](mcusX * 8 * compHv(c)._1 * mcusY * 8 * compHv(c)._2)
    }.toArray
    val dcPred = new Array[Int](nComp)
    val blk = new Array[Int](64)
    var my = 0
    while (my < mcusY && !bad) {
      var mx = 0
      while (mx < mcusX && !bad) {
        var cc = 0
        while (cc < nComp && !bad) {
          val (hc, vc) = compHv(cc)
          val q = qt(compQ(cc))
          var by = 0
          while (by < vc && !bad) {
            var bx = 0
            while (bx < hc && !bad) {
              java.util.Arrays.fill(blk, 0)
              val ds = huffDec(dcTabs(compDc(cc)))
              if (!bad) {
                if (ds < 0 || ds > 11) bad = true
                else {
                  dcPred(cc) += extend(receive(ds), ds)
                  blk(0) = dcPred(cc) * q(0)
                  var k = 1
                  while (k < 64 && !bad) {
                    val rs = huffDec(acTabs(compAc(cc)))
                    if (bad || rs < 0) { bad = true }
                    else {
                      val r = rs >> 4; val s = rs & 0x0f
                      if (s == 0) {
                        if (r == 15) k += 16 else k = 64 // ZRL / EOB
                      } else {
                        k += r
                        if (k > 63) bad = true
                        else {
                          val nat = ZigzagOrder(k)
                          blk(nat) = extend(receive(s), s) * q(nat)
                          k += 1
                        }
                      }
                    }
                  }
                }
              }
              if (!bad) {
                // IDCT + level shift + clamp, into the component plane
                val cw = mcusX * 8 * hc
                val ox = (mx * hc + bx) * 8; val oy = (my * vc + by) * 8
                var y2 = 0
                while (y2 < 8) {
                  var x = 0
                  while (x < 8) {
                    var s = 0.0
                    var u = 0
                    while (u < 8) {
                      var v = 0
                      while (v < 8) {
                        val f = blk(v * 8 + u)
                        if (f != 0) s += JC(u) * JC(v) * f * JCos(u)(x) * JCos(v)(y2)
                        v += 1
                      }
                      u += 1
                    }
                    val px = math.max(0, math.min(255, math.rint(0.25 * s).toInt + 128))
                    planes(cc)((oy + y2) * cw + ox + x) = px
                    x += 1
                  }
                  y2 += 1
                }
              }
              bx += 1
            }
            by += 1
          }
          cc += 1
        }
        mx += 1
      }
      my += 1
    }
    if (bad) return None
    // strict tail: discard pad bits, then exactly EOI, then end of payload
    nbits = 0
    if (pos + 2 != p.length || u8(pos) != 0xff || u8(pos + 1) != 0xd9) return None
    // upsample + inverse color transform to channel-interleaved samples
    val outArr = new Array[Int](w * h * nComp)
    if (nComp == 1) {
      val cw = mcusX * 8
      var y2 = 0
      while (y2 < h) {
        var x = 0
        while (x < w) { outArr(y2 * w + x) = planes(0)(y2 * cw + x); x += 1 }
        y2 += 1
      }
    } else {
      def cl(d: Double): Int = math.max(0, math.min(255, math.rint(d).toInt))
      val cws = (0 until 3).map(c => mcusX * 8 * compHv(c)._1).toArray
      var y2 = 0
      while (y2 < h) {
        var x = 0
        while (x < w) {
          def samp(c: Int): Int = {
            val sx = x * compHv(c)._1 / hmax; val sy = y2 * compHv(c)._2 / vmax
            planes(c)(sy * cws(c) + sx)
          }
          val yv = samp(0); val cb = samp(1) - 128; val cr = samp(2) - 128
          val o = (y2 * w + x) * 3
          outArr(o) = cl(yv + 1.402 * cr)
          outArr(o + 1) = cl(yv - 0.344136 * cb - 0.714136 * cr)
          outArr(o + 2) = cl(yv + 1.772 * cb)
          x += 1
        }
        y2 += 1
      }
    }
    Some((w, h, nComp, outArr))
  }

  /** JPEG decode over the asset battery — the LOSSY real-codec branch
    * beside [[pngDecode]]: each payload's bytes are cycled into a
    * [[JpegN]]² body, compressed as a REAL baseline JPEG (media lane picks
    * the layout: image → 4:2:0 color, the dominant crawl shape; video →
    * 4:4:4 color; audio/text → grayscale) and round-tripped through
    * [[decodeJpeg]] — huffman decode, dequant and the integer-clamped
    * float IDCT are exercised per block, not faked. The declared output
    * serves the exact SOURCE channel means (SQL-recomputable) plus an
    * EARNED `within_tol` = 1 iff every decoded channel mean sits within
    * [[JpegTol]] of its source mean — a garbage decode cannot pass, and
    * the lossy decoded values themselves stay on the engine-only detail
    * frame ([[jpegDecodeDetail]], OpsSpec-pinned) rather than weakening
    * the hash gate.
    *
    * Scale shape: one typed mapPartitions, blob bytes never shuffle,
    * fixed-width output row per asset.
    */
  def jpegDecode(s: SparkSession, dir: String): DataFrame =
    jpegDecodeDetail(s, dir)
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("n_components"), col("sampling"),
        col("ch0_src_mean"), col("ch1_src_mean"), col("ch2_src_mean"),
        when(greatest(
          abs(col("ch0_dec_mean") - col("ch0_src_mean")),
          abs(col("ch1_dec_mean") - col("ch1_src_mean")),
          abs(col("ch2_dec_mean") - col("ch2_src_mean"))) <= JpegTol, lit(1L))
          .otherwise(lit(0L)).as("within_tol"))
      .orderBy("doc_id")

  private[graft] def jpegDecodeDetail(s: SparkSession, dir: String): DataFrame =
    jpegDecodeDetailOf(assets(s, dir))

  private[graft] def jpegDecodeDetailOf(assetFrame: DataFrame): DataFrame = {
    import assetFrame.sparkSession.implicits._
    assetFrame
      .filter(length(col("payload")) > 0)
      .as[MediaAsset]
      .mapPartitions { it =>
        it.map { a =>
          val (planes, subsample, sampling) = a.media_type match {
            case "image" => (3, true, "4:2:0")
            case "video" => (3, false, "4:4:4")
            case _ => (1, false, "gray")
          }
          val body = new Array[Byte](JpegN * JpegN * planes)
          var k = 0
          while (k < body.length) { body(k) = a.payload(k % a.payload.length); k += 1 }
          val jpg = encodeJpeg(JpegN, JpegN, planes, subsample, body)
          val (w, h, nc, dec) = decodeJpeg(jpg).getOrElse(
            throw new IllegalStateException(s"JPEG round-trip failed: doc ${a.doc_id}"))
          val n = w.toLong * h
          val srcSums = new Array[Long](3)
          k = 0
          while (k < body.length) { srcSums(k % planes) += body(k) & 0xff; k += 1 }
          val decSums = new Array[Long](3)
          k = 0
          while (k < dec.length) { decSums(k % nc) += dec(k); k += 1 }
          def m(sums: Array[Long], c: Int): Double =
            if (c < planes) sums(c).toDouble / n else 0.0
          JpegDecoded(a.doc_id, a.media_type, w, h, nc, sampling, jpg.length,
            m(srcSums, 0), m(srcSums, 1), m(srcSums, 2),
            m(decSums, 0), m(decSums, 1), m(decSums, 2))
        }
      }
      .toDF()
      .withColumn("ch0_src_mean", round(col("ch0_src_mean"), 6))
      .withColumn("ch1_src_mean", round(col("ch1_src_mean"), 6))
      .withColumn("ch2_src_mean", round(col("ch2_src_mean"), 6))
      .drop("jpeg_bytes")
  }

  /** Synthetic blob container layout the decoder parses (defined here, not
    * in any external library — the container ships no image/audio codecs):
    *   - bytes [0, 4): magic (emitted as lowercase hex; shorter payloads
    *     emit the bytes that exist)
    *   - bytes [4, 8): reserved header (skipped)
    *   - bytes [8, …): sample body — channels interleaved round-robin,
    *     channel count fixed by media type (image/video = 3, audio = 2,
    *     text = 1), i.e. body byte j belongs to channel j % n_channels.
    * The decoder emits the header magic plus each channel's byte mean —
    * a channel with no body bytes pins to 0.0 (never NULL/NaN, so the
    * cross-engine compare has one canonical value).
    */
  // ---------------------------------------------------------- mm_gif_decode

  private[graft] val GifN = 16 // synthesized image side (N×N)
  private[graft] val GifPalBits = 6 // 64-entry global color table
  private[graft] val GifPalSize = 1 << GifPalBits

  /** Deterministic global color table: entry k = (4k, 7k mod 256,
    * 13k mod 256) — SQL-recomputable, so the oracle rebuilds the decoded
    * RGB means from the synthesized indices alone.
    */
  private[graft] def gifPalette(k: Int): (Int, Int, Int) =
    (k * 4, (k * 7) % 256, (k * 13) % 256)

  /** Real GIF87a encoder — the synthesis half of the round-trip (and the
    * fixture encoder, like [[encodePng]]): global color table, ONE
    * non-interlaced image, variable-width LSB-first LZW with CLEAR up
    * front and on dictionary overflow, EOI, sub-block framing, trailer.
    * Emit-before-add ordering and the widen-after-add rule
    * (`next == 2^width → width+1`, cap 12) mirror [[decodeGif]] exactly —
    * the code widths only stay in lockstep because BOTH sides count adds
    * the same way (the classic compress/decompress alignment).
    */
  private[graft] def encodeGif(w: Int, h: Int, idx: Array[Byte]): Array[Byte] = {
    require(idx.length == w * h, "index body must be exactly w*h")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    out.write(0x80 | ((GifPalBits - 1) << 4) | (GifPalBits - 1))
    out.write(0); out.write(0) // background index, aspect
    var k = 0
    while (k < GifPalSize) {
      val (r, g, b) = gifPalette(k)
      out.write(r); out.write(g); out.write(b); k += 1
    }
    out.write(0x2c); le16(0); le16(0); le16(w); le16(h)
    out.write(0) // no local table, not interlaced
    val minCode = GifPalBits
    out.write(minCode)
    val clear = 1 << minCode
    val eoi = clear + 1
    var next = eoi + 1
    var width = minCode + 1
    val dict = new java.util.HashMap[Int, Integer]()
    var bitBuf = 0L; var bitCnt = 0
    val data = new java.io.ByteArrayOutputStream()
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += width
      while (bitCnt >= 8) {
        data.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    emit(clear)
    var cur = idx(0) & 0xff
    var i = 1
    while (i < idx.length) {
      val c = idx(i) & 0xff
      val key = (cur << 8) | c // cur ≤ 4095, c ≤ 255 — unique 20-bit key
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        emit(cur) // emit BEFORE add — keeps decoder's add count aligned
        // widen BEFORE this step's add: the encoder's dictionary runs one
        // entry ahead of the decoder's (the decoder adds while processing
        // the NEXT code), so the pre-add count here equals the decoder's
        // post-add count at the same stream position — checking after the
        // add widens one code early and desynchronizes every code width
        // past the first 2^width boundary
        if (next == (1 << width) && width < 12) width += 1
        if (next < 4096) { dict.put(key, next); next += 1 }
        else {
          emit(clear)
          dict.clear(); next = eoi + 1; width = minCode + 1
        }
        cur = c
      }
      i += 1
    }
    emit(cur)
    // the decoder adds one more entry while processing that final data
    // code — mirror its possible widen before writing EOI
    if (next == (1 << width) && width < 12) width += 1
    emit(eoi)
    if (bitCnt > 0) data.write((bitBuf & 0xff).toInt)
    val bytes = data.toByteArray
    var off = 0
    while (off < bytes.length) {
      val nb = math.min(255, bytes.length - off)
      out.write(nb); out.write(bytes, off, nb); off += nb
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Strict GIF decoder — the palette/LZW branch of the real-codec tier
    * (PNG covers filters+Deflate, JPEG covers entropy+transform coding;
    * GIF's LZW-over-palette is the remaining classic still-image class).
    * GIF87a/89a signatures; a GLOBAL color table is required; extension
    * blocks are skipped by their sub-block framing; decodes the FIRST
    * image only and requires the trailer after it. Returns
    * (w, h, palette_size, palette r,g,b flattened, indices) or None.
    * Rejected outright: interlaced images, a missing global table, LZW
    * codes above the dictionary's next slot, an output longer than w·h
    * or a stream that ends before filling it, a missing EOI/terminator/
    * trailer, and any truncation (every read is bounds-checked).
    */
  private[graft] def decodeGif(p: Array[Byte]): Option[(Int, Int, Int, Array[Int], Array[Byte])] = {
    if (p.length < 13) return None
    val sig = new String(p, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u8(i: Int): Int = p(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val packed = u8(10)
    if ((packed & 0x80) == 0) return None // global color table required
    val palBits = (packed & 0x07) + 1
    val palSize = 1 << palBits
    var i = 13
    if (i + palSize * 3 > p.length) return None
    val pal = new Array[Int](palSize * 3)
    var k = 0
    while (k < palSize * 3) { pal(k) = u8(i + k); k += 1 }
    i += palSize * 3
    // skip extensions; find the first image descriptor
    while (i < p.length && u8(i) == 0x21) {
      i += 2 // introducer + label
      while (i < p.length && u8(i) != 0) {
        i += 1 + u8(i)
        if (i > p.length) return None
      }
      i += 1 // sub-block terminator
    }
    if (i >= p.length || u8(i) != 0x2c) return None
    if (i + 10 > p.length) return None
    val w = le16(i + 5); val h = le16(i + 7)
    val ipacked = u8(i + 9)
    if (w <= 0 || h <= 0) return None
    if ((ipacked & 0x40) != 0) return None // interlaced: rejected
    var palUse = pal; var palSizeUse = palSize
    i += 10
    if ((ipacked & 0x80) != 0) { // local color table overrides
      val lb = (ipacked & 0x07) + 1
      val ls = 1 << lb
      if (i + ls * 3 > p.length) return None
      val lp = new Array[Int](ls * 3)
      var q = 0
      while (q < ls * 3) { lp(q) = u8(i + q); q += 1 }
      palUse = lp; palSizeUse = ls; i += ls * 3
    }
    if (i >= p.length) return None
    val minCode = u8(i); i += 1
    if (minCode < 2 || minCode > 11) return None
    val clear = 1 << minCode
    val eoi = clear + 1
    // concatenate sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while (i < p.length && u8(i) != 0) {
      val nb = u8(i)
      if (i + 1 + nb > p.length) return None
      data.write(p, i + 1, nb); i += 1 + nb
    }
    if (i >= p.length || u8(i) != 0) return None
    i += 1
    if (i >= p.length || u8(i) != 0x3b) return None // trailer required
    val bytes = data.toByteArray
    // LZW decode, LSB-first variable width
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = eoi + 1
    var width = minCode + 1
    val out = new Array[Byte](w * h)
    var outN = 0
    var bitBuf = 0L; var bitCnt = 0; var bi = 0
    var prev = -1
    val stack = new Array[Byte](4096)
    def firstOf(code: Int): Int = {
      var c = code
      while (c >= clear + 2) c = prefix(c)
      c
    }
    // writes code's byte sequence (plus one extra literal for the KwKwK
    // case) into out; false on overflow past w·h
    def writeSeq(code: Int, extra: Int): Boolean = {
      var sp = 0; var c = code
      while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val len = sp + 1 + (if (extra >= 0) 1 else 0)
      if (outN + len > out.length) return false
      out(outN) = c.toByte; outN += 1
      while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
      if (extra >= 0) { out(outN) = extra.toByte; outN += 1 }
      true
    }
    var done = false
    while (!done) {
      while (bitCnt < width && bi < bytes.length) {
        bitBuf |= (bytes(bi) & 0xffL) << bitCnt; bitCnt += 8; bi += 1
      }
      if (bitCnt < width) return None // truncated before EOI
      val code = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width; bitCnt -= width
      if (code == eoi) done = true
      else if (code == clear) {
        next = eoi + 1; width = minCode + 1; prev = -1
      } else if (prev == -1) {
        if (code >= clear) return None // first code must be a literal
        if (outN + 1 > out.length) return None
        out(outN) = code.toByte; outN += 1
        prev = code
      } else if (code <= next) {
        // code == next is the KwKwK case: seq(prev) + first(seq(prev))
        val first = firstOf(if (code == next) prev else code)
        val ok =
          if (code == next) writeSeq(prev, first) else writeSeq(code, -1)
        if (!ok) return None
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first.toByte; next += 1
          if (next == (1 << width) && width < 12) width += 1
        } else if (code == next) return None // KwKwK needs a free slot
        prev = code
      } else return None // code above the dictionary's next slot
    }
    if (outN != w * h) return None // wrong pixel count
    var v = 0
    while (v < outN) { if ((out(v) & 0xff) >= palSizeUse) return None; v += 1 }
    Some((w, h, palSizeUse, palUse, out))
  }

  /** GIF decode over the asset battery: payload bytes are reduced mod the
    * palette size into a [[GifN]]² index body, framed as a REAL GIF87a by
    * [[encodeGif]] and round-tripped through [[decodeGif]] — sub-block
    * deframing, variable-width LZW and the palette lookup exercised per
    * row, not faked — then reduced to exact-integer per-channel RGB means
    * through the color table. [[decodeGif]] is the strict single-image
    * round-trip half (trailer immediately after the first image;
    * animations and trailing extensions rejected) — a real-GIF corpus
    * would additionally need a sniff-and-passthrough branch in place of
    * the synthesis step before this plan ran unchanged.
    *
    * Scale shape: one typed mapPartitions (same codec slot as PNG/JPEG —
    * blob bytes never shuffle), fixed 8-column row per asset out.
    */
  def gifDecode(s: SparkSession, dir: String): DataFrame =
    gifDecodeOf(assets(s, dir))

  private[graft] def gifDecodeOf(assetFrame: DataFrame): DataFrame = {
    import assetFrame.sparkSession.implicits._
    assetFrame
      .filter(length(col("payload")) > 0)
      .as[MediaAsset]
      .mapPartitions { it =>
        it.map { a =>
          val idx = new Array[Byte](GifN * GifN)
          var k = 0
          while (k < idx.length) {
            idx(k) = ((a.payload(k % a.payload.length) & 0xff) % GifPalSize).toByte
            k += 1
          }
          val gif = encodeGif(GifN, GifN, idx)
          val (w, h, ps, pal, outIdx) = decodeGif(gif).getOrElse(
            throw new IllegalStateException(s"GIF round-trip failed: doc ${a.doc_id}"))
          val sums = new Array[Long](3)
          var j = 0
          while (j < outIdx.length) {
            val q = (outIdx(j) & 0xff) * 3
            sums(0) += pal(q); sums(1) += pal(q + 1); sums(2) += pal(q + 2)
            j += 1
          }
          val n = w.toLong * h
          GifDecoded(a.doc_id, a.media_type, w, h, ps, gif.length,
            sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n)
        }
      }
      .toDF()
      .withColumn("r_mean", round(col("r_mean"), 6))
      .withColumn("g_mean", round(col("g_mean"), 6))
      .withColumn("b_mean", round(col("b_mean"), 6))
      // LZW output size is engine-only evidence (not SQL-recomputable) —
      // dropped rather than weakening the hash gate, the png_bytes rule
      .drop("gif_bytes")
      .orderBy("doc_id")
  }

  private val HeaderBytes = 8
  private val MagicBytes = 4

  private[graft] def channelsOf(mediaType: String): Int = mediaType match {
    case "image" | "video" => 3
    case "audio" => 2
    case _ => 1
  }

  /** A REAL image codec branch: binary netpbm (public spec, trivially
    * parseable pure-JVM, no external libs) — P6 (PPM, 3-channel RGB) and
    * its P5 (PGM, 1-channel gray) sibling share one header grammar: ASCII
    * magic, whitespace/#-comment separated width, height, maxval ≤ 255,
    * exactly one whitespace byte, then width·height samples of
    * `channels` bytes each. Returns (magic, w, h, per-channel means padded
    * to 3 — a gray image's mean sits in slot 0, slots 1-2 pin to 0.0 like
    * any channel with no body bytes), or None unless the payload is a
    * STRICTLY valid complete image (body length must equal channels·w·h
    * exactly), so a synthetic blob that merely starts with 'P''5'/'P''6'
    * can never be misparsed — it falls back to the container layout.
    */
  private[graft] def decodeNetpbm(p: Array[Byte]): Option[(String, Int, Int, Array[Double])] =
    netpbmHeader(p).map { case (nch, w, h, off) =>
      val sums = new Array[Long](3)
      var j = off
      while (j < p.length) { sums((j - off) % nch) += p(j) & 0xff; j += 1 }
      val n = w.toLong * h
      (new String(p, 0, 2, "US-ASCII"), w, h, sums.map(_.toDouble / n))
    }

  /** The strict header parse both decode entry points share: Some((channels,
    * width, height, body offset)) iff the payload is a complete, valid
    * P5/P6 image under the rules in [[decodeNetpbm]]'s scaladoc.
    */
  private def netpbmHeader(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (p.length < 2 || p(0) != 'P' || (p(1) != '5' && p(1) != '6')) return None
    val nch = if (p(1) == '6') 3 else 1
    var i = 2
    def skipWs(): Unit = {
      var more = true
      while (more && i < p.length) {
        val c = p(i)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else if (c == '#') { while (i < p.length && p(i) != '\n') i += 1 }
        else more = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0L
      var any = false
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        v = v * 10 + (p(i) - '0'); any = true; i += 1
        if (v > Int.MaxValue) return -1
      }
      if (any) v.toInt else -1
    }
    val w = int(); val h = int(); val maxval = int()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    // exactly ONE whitespace byte separates maxval from the sample body
    if (i >= p.length || !(p(i) == ' ' || p(i) == '\t' || p(i) == '\n' || p(i) == '\r'))
      return None
    i += 1
    if (p.length - i != nch.toLong * w * h) return None // strict: complete body
    Some((nch, w, h, i))
  }

  /** Decoded GRAY pixels, row-major (y·w + x): P5 samples verbatim, P6
    * collapsed to integer luma (r + g + b) div 3 — exact arithmetic so the
    * downstream DCT stays engine-reproducible. None unless strictly valid.
    */
  private[graft] def decodeNetpbmPixels(p: Array[Byte]): Option[Array[Int]] =
    netpbmHeader(p).map { case (nch, w, h, off) =>
      val pix = new Array[Int](w * h)
      var k = 0
      while (k < pix.length) {
        if (nch == 1) pix(k) = p(off + k) & 0xff
        else {
          val b = off + 3 * k
          pix(k) = ((p(b) & 0xff) + (p(b + 1) & 0xff) + (p(b + 2) & 0xff)) / 3
        }
        k += 1
      }
      pix
    }

  /** Minimal strict-form P5 encoder — the inverse of [[netpbmHeader]] for
    * gray images, used to frame synthesized pixel bodies as real blobs the
    * decoder round-trips.
    */
  private[graft] def encodeP5(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    require(body.length == w * h, "P5 body must be exactly w*h samples")
    val header = s"P5 $w $h 255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + body.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(body, 0, out, header.length, body.length)
    out
  }

  /** A real byte-level parse — netpbm branch (P5/P6) first, container
    * layout otherwise; imperative over the payload array, one pass, no
    * allocation beyond the per-channel sums.
    */
  private def decode(md: java.security.MessageDigest)(a: MediaAsset): DecodedAsset = {
    val p = a.payload
    decodeNetpbm(p) match {
      case Some((magic, _, _, means)) =>
        md.reset()
        val hex = md.digest(p).map("%02x".format(_)).mkString
        // magic reports the real format tag; P6 channels are R, G, B;
        // P5's single gray channel sits in slot 0
        return DecodedAsset(a.doc_id, a.media_type, p.length, magic,
          if (magic == "P6") 3 else 1, means(0), means(1), means(2), hex)
      case None => ()
    }
    val nch = channelsOf(a.media_type)
    val magicLen = math.min(MagicBytes, p.length)
    val magic = new java.lang.StringBuilder(2 * magicLen)
    var i = 0
    while (i < magicLen) { magic.append(f"${p(i) & 0xff}%02x"); i += 1 }
    val sums = new Array[Long](3)
    val cnts = new Array[Long](3)
    i = HeaderBytes
    while (i < p.length) {
      val c = (i - HeaderBytes) % nch
      sums(c) += p(i) & 0xff
      cnts(c) += 1
      i += 1
    }
    def mean(c: Int): Double = if (cnts(c) == 0) 0.0 else sums(c).toDouble / cnts(c)
    md.reset()
    val hex = md.digest(p).map("%02x".format(_)).mkString
    DecodedAsset(a.doc_id, a.media_type, p.length, magic.toString, nch,
      mean(0), mean(1), mean(2), hex)
  }

  /** The decode core over an explicit asset Dataset — factored for fixture
    * tests with hand-constructed payloads.
    */
  private[graft] def typedDecodeOf(ds: org.apache.spark.sql.Dataset[MediaAsset]): DataFrame =
    ds.mapPartitions { it =>
        // codec state (the digest) initializes ONCE per partition and is
        // reused across the iterator — the mapInPandas-batch analogue
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map(decode(md))
      }(org.apache.spark.sql.Encoders.product[DecodedAsset])
      .toDF()
      // rounding stays in Column space so both engines round identically
      .withColumn("ch0_mean", round(col("ch0_mean"), 6))
      .withColumn("ch1_mean", round(col("ch1_mean"), 6))
      .withColumn("ch2_mean", round(col("ch2_mean"), 6))

  /** The typed decode pipeline: Dataset[MediaAsset] → mapPartitions(decode)
    * → Dataset[DecodedAsset]. mapPartitions gives the decoder one iterator
    * per parquet split — the JVM-side analogue of mapInPandas batches: codec
    * init (the MessageDigest) amortizes across the partition, and
    * parallelism = input splits, so a 100 TB decode scales with the scan.
    */
  def typedDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    typedDecodeOf(assets(s, dir).as[MediaAsset]).orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta_stats" -> (metaStats(_, _)),
    "mm_decode_features" -> (decodeFeatures(_, _)),
    "mm_frame_sample" -> (frameSample(_, _)),
    "mm_frame_dedup" -> (frameDedup(_, _)),
    "mm_resize" -> (resize(_, _)),
    "mm_typed_decode" -> (typedDecode(_, _)),
    "mm_shard_manifest" -> (shardManifest(_, _)),
    "mm_phash_neardup" -> (phashNearDup(_, _)),
    "mm_phash_dedup" -> (phashDedup(_, _)),
    "mm_scene_cut" -> (sceneCut(_, _)),
    "mm_dct_phash" -> (dctPhash(_, _)),
    "mm_wav_energy" -> (wavEnergy(_, _)),
    "mm_wav_vad" -> (wavVad(_, _)),
    "mm_wav_downsample" -> (wavDownsample(_, _)),
    "mm_png_decode" -> (pngDecode(_, _)),
    "mm_jpeg_decode" -> (jpegDecode(_, _)),
    "mm_gif_decode" -> (gifDecode(_, _)))

  // ------------------------------------------------------------- oracle SQL

  private val mtSql =
    "(['image', 'audio', 'video', 'text'])[(substr(source, 4)::INT % 4) + 1]"

  /** The [[DctCos]] table as literal (u, x, c) rows — the shared-constant
    * bridge that keeps the oracle's DCT bit-identical to the JVM's.
    */
  private def dctCosRows: String =
    (for (u <- 0 until DctBlock; x <- 0 until DctN)
      yield s"($u, $x, ${DctCos(u)(x)})").mkString(", ")

  val oracles: Map[String, String] = Map(
    "mm_png_decode" ->
      // the PNG container round-trip (CRC, inflate, unfilter) is engine-
      // side structure; the oracle recomputes the decoded per-channel
      // means from the same cycled byte synthesis — any codec bug breaks
      // the byte-exact round-trip and lands here as a mean mismatch
      s"""WITH a AS (
         |  SELECT doc_id, $mtSql AS media_type, text, length(text)::BIGINT AS len
         |  FROM documents WHERE length(text) > 0
         |), p AS (
         |  SELECT doc_id, media_type, text, len,
         |    CASE media_type WHEN 'image' THEN 2 WHEN 'video' THEN 6
         |         ELSE 0 END AS color_type,
         |    CASE media_type WHEN 'image' THEN 3 WHEN 'video' THEN 4
         |         ELSE 1 END::BIGINT AS ch
         |  FROM a
         |), s AS (
         |  SELECT doc_id, media_type, color_type, ch, i % ch AS c,
         |    ascii(substr(text, ((i % len) + 1)::INT, 1))::BIGINT AS v
         |  FROM (SELECT doc_id, media_type, color_type, ch, text, len,
         |          unnest(range(${PngN * PngN} * ch)) AS i FROM p)
         |)
         |SELECT doc_id, media_type, $PngN::INT AS width, $PngN::INT AS height,
         |  color_type::INT AS color_type, ch::INT AS n_channels,
         |  round(sum(CASE WHEN c = 0 THEN v ELSE 0 END)::DOUBLE / ${PngN * PngN}, 6)
         |    AS ch0_mean,
         |  round(sum(CASE WHEN c = 1 THEN v ELSE 0 END)::DOUBLE / ${PngN * PngN}, 6)
         |    AS ch1_mean,
         |  round(sum(CASE WHEN c = 2 THEN v ELSE 0 END)::DOUBLE / ${PngN * PngN}, 6)
         |    AS ch2_mean,
         |  round(sum(CASE WHEN c = 3 THEN v ELSE 0 END)::DOUBLE / ${PngN * PngN}, 6)
         |    AS alpha_mean
         |FROM s GROUP BY doc_id, media_type, color_type, ch
         |ORDER BY doc_id""".stripMargin,
    "mm_gif_decode" ->
      // the GIF container round-trip (sub-block deframing, variable-width
      // LZW, palette lookup) is engine-side structure and LOSSLESS; the
      // oracle recomputes the RGB means from the same mod-palette index
      // synthesis and the SQL-expressible color-table formula — any LZW
      // or palette bug breaks the byte-exact round-trip and lands here
      // as a mean mismatch
      s"""WITH a AS (
         |  SELECT doc_id, $mtSql AS media_type, text, length(text)::BIGINT AS len
         |  FROM documents WHERE length(text) > 0
         |), s AS (
         |  SELECT doc_id, media_type,
         |    ascii(substr(text, ((i % len) + 1)::INT, 1))::BIGINT % $GifPalSize AS k
         |  FROM (SELECT doc_id, media_type, text, len,
         |          unnest(range(${GifN * GifN})) AS i FROM a)
         |)
         |SELECT doc_id, media_type, $GifN::INT AS width, $GifN::INT AS height,
         |  $GifPalSize::INT AS palette_size,
         |  round(sum(k * 4)::DOUBLE / ${GifN * GifN}, 6) AS r_mean,
         |  round(sum((k * 7) % 256)::DOUBLE / ${GifN * GifN}, 6) AS g_mean,
         |  round(sum((k * 13) % 256)::DOUBLE / ${GifN * GifN}, 6) AS b_mean
         |FROM s GROUP BY doc_id, media_type
         |ORDER BY doc_id""".stripMargin,
    "mm_jpeg_decode" ->
      // the compressed round-trip (huffman, dequant, IDCT, color transform)
      // is engine-side and LOSSY; the oracle recomputes the exact SOURCE
      // channel means from the same cycled byte synthesis and emits a
      // literal within_tol = 1 — the engine must EARN the 1 by decoding
      // back to within JpegTol of the source means (a garbage or wrong
      // decode hash-mismatches here)
      s"""WITH a AS (
         |  SELECT doc_id, $mtSql AS media_type, text, length(text)::BIGINT AS len
         |  FROM documents WHERE length(text) > 0
         |), p AS (
         |  SELECT doc_id, media_type, text, len,
         |    CASE media_type WHEN 'image' THEN 3 WHEN 'video' THEN 3
         |         ELSE 1 END::BIGINT AS ch,
         |    CASE media_type WHEN 'image' THEN '4:2:0' WHEN 'video' THEN '4:4:4'
         |         ELSE 'gray' END AS sampling
         |  FROM a
         |), s AS (
         |  SELECT doc_id, media_type, sampling, ch, i % ch AS c,
         |    ascii(substr(text, ((i % len) + 1)::INT, 1))::BIGINT AS v
         |  FROM (SELECT doc_id, media_type, sampling, ch, text, len,
         |          unnest(range(${JpegN * JpegN} * ch)) AS i FROM p)
         |)
         |SELECT doc_id, media_type, $JpegN::INT AS width, $JpegN::INT AS height,
         |  ch::INT AS n_components, sampling,
         |  round(sum(CASE WHEN c = 0 THEN v ELSE 0 END)::DOUBLE / ${JpegN * JpegN}, 6)
         |    AS ch0_src_mean,
         |  round(sum(CASE WHEN c = 1 THEN v ELSE 0 END)::DOUBLE / ${JpegN * JpegN}, 6)
         |    AS ch1_src_mean,
         |  round(sum(CASE WHEN c = 2 THEN v ELSE 0 END)::DOUBLE / ${JpegN * JpegN}, 6)
         |    AS ch2_src_mean,
         |  1::BIGINT AS within_tol
         |FROM s GROUP BY doc_id, media_type, sampling, ch
         |ORDER BY doc_id""".stripMargin,
    "mm_wav_energy" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text)::BIGINT AS n FROM documents
         |  WHERE length(text) > 0
         |), s AS (
         |  SELECT doc_id, n, i,
         |    abs((ascii(substr(text, (i + 1)::INT, 1)) - 128) * 256)::BIGINT AS a
         |  FROM (SELECT doc_id, n, text, unnest(range(n)) AS i FROM d)
         |), agg AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_samples, sum(a)::BIGINT AS sum_abs,
         |    max(a)::BIGINT AS peak_amp
         |  FROM s GROUP BY doc_id
         |), w AS (
         |  SELECT doc_id, i // $WavWindow AS win, sum(a) AS wsum
         |  FROM s WHERE i // $WavWindow < n // $WavWindow
         |  GROUP BY doc_id, i // $WavWindow
         |), ws AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_windows,
         |    sum(CASE WHEN wsum < ${SilenceAmp * WavWindow} THEN 1 ELSE 0 END)::BIGINT
         |      AS n_silent
         |  FROM w GROUP BY doc_id
         |)
         |SELECT a.doc_id, n_samples,
         |  coalesce(n_windows, 0)::BIGINT AS n_windows,
         |  coalesce(n_silent, 0)::BIGINT AS n_silent,
         |  CASE WHEN coalesce(n_windows, 0) = 0 THEN 0.0
         |       ELSE round(n_silent::DOUBLE / n_windows, 6) END AS silence_ratio,
         |  peak_amp,
         |  round(sum_abs::DOUBLE / n_samples, 6) AS mean_abs
         |FROM agg a LEFT JOIN ws ON ws.doc_id = a.doc_id
         |ORDER BY a.doc_id""".stripMargin,
    "mm_wav_vad" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text)::BIGINT AS n FROM documents
         |  WHERE length(text) > 0
         |), s AS (
         |  SELECT doc_id, n, i,
         |    abs((ascii(substr(text, (i + 1)::INT, 1)) - 128) * 256)::BIGINT AS a
         |  FROM (SELECT doc_id, n, text, unnest(range(n)) AS i FROM d)
         |), w AS (
         |  SELECT doc_id, i // $VadWindow AS win, sum(a) AS wsum
         |  FROM s WHERE i // $VadWindow < n // $VadWindow
         |  GROUP BY doc_id, i // $VadWindow
         |), tot AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_windows,
         |    sum(CASE WHEN wsum >= ${VadAmp * VadWindow} THEN 1 ELSE 0 END)::BIGINT
         |      AS n_active
         |  FROM w GROUP BY doc_id
         |), act AS (
         |  SELECT doc_id, win FROM w WHERE wsum >= ${VadAmp * VadWindow}
         |), brk AS (
         |  SELECT doc_id, win,
         |    CASE WHEN lag(win) OVER (PARTITION BY doc_id ORDER BY win) IS NULL
         |      OR win - lag(win) OVER (PARTITION BY doc_id ORDER BY win)
         |        > ${VadMaxGap + 1} THEN 1 ELSE 0 END AS b
         |  FROM act
         |), seg AS (
         |  SELECT doc_id, win,
         |    sum(b) OVER (PARTITION BY doc_id ORDER BY win
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM brk
         |), spans AS (
         |  SELECT doc_id, sid, min(win) AS s0, (max(win) - min(win) + 1) AS span
         |  FROM seg GROUP BY doc_id, sid
         |), ranked AS (
         |  SELECT doc_id, s0, span,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY span DESC, s0 ASC) AS rk,
         |    count(*) OVER (PARTITION BY doc_id) AS n_segments
         |  FROM spans
         |), best AS (
         |  SELECT doc_id, n_segments, span AS longest_span, s0 AS longest_start
         |  FROM ranked WHERE rk = 1
         |)
         |SELECT t.doc_id, t.n_windows, t.n_active,
         |  coalesce(b.n_segments, 0)::BIGINT AS n_segments,
         |  coalesce(b.longest_span, 0)::BIGINT AS longest_span,
         |  coalesce(b.longest_start, -1)::BIGINT AS longest_start,
         |  CASE WHEN t.n_windows = 0 THEN 0.0
         |       ELSE round(t.n_active::DOUBLE / t.n_windows, 6) END AS active_ratio
         |FROM tot t LEFT JOIN best b ON b.doc_id = t.doc_id
         |ORDER BY t.doc_id""".stripMargin,
    "mm_dct_phash" ->
      s"""WITH px AS (
         |  SELECT doc_id, (k % $DctN)::INT AS x, (k // $DctN)::INT AS y,
         |    ascii(substr(text, ((k % length(text)) + 1)::INT, 1))::BIGINT AS v
         |  FROM (SELECT doc_id, text, unnest(range(${DctN * DctN})) AS k
         |        FROM documents WHERE length(text) > 0)
         |), cx(u, x, c) AS (
         |  SELECT * FROM (VALUES $dctCosRows)
         |), g AS (
         |  SELECT doc_id, u, y, sum(v * c)::BIGINT AS gv
         |  FROM px JOIN cx ON cx.x = px.x
         |  GROUP BY doc_id, u, y
         |), f AS (
         |  SELECT g.doc_id, g.u AS u, cy.u AS v, sum(gv * cy.c)::BIGINT AS fv
         |  FROM g JOIN cx cy ON cy.x = g.y
         |  GROUP BY g.doc_id, g.u, cy.u
         |), m AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN u = 0 AND v = 0 THEN 0 ELSE fv END)::BIGINT AS msum
         |  FROM f GROUP BY doc_id
         |), bits AS (
         |  SELECT f.doc_id, (u * $DctBlock + v)::INT AS i,
         |    CASE WHEN 63 * fv > msum THEN 1 ELSE 0 END AS bit
         |  FROM f JOIN m ON m.doc_id = f.doc_id
         |), bands AS (
         |  SELECT doc_id, (i // 16)::INT AS band_idx,
         |    sum(bit * (1::BIGINT << (15 - (i % 16))::INT))::BIGINT AS band_val
         |  FROM bits GROUP BY doc_id, i // 16
         |), wide AS (
         |  SELECT doc_id, list(band_val ORDER BY band_idx) AS bands
         |  FROM bands GROUP BY doc_id
         |), cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
         |      AND x.doc_id < y.doc_id
         |), ham AS (
         |  SELECT doc_a, doc_b,
         |    (bit_count(xor(wa.bands[1], wb.bands[1]))
         |     + bit_count(xor(wa.bands[2], wb.bands[2]))
         |     + bit_count(xor(wa.bands[3], wb.bands[3]))
         |     + bit_count(xor(wa.bands[4], wb.bands[4])))::INT AS hamming
         |  FROM cand
         |  JOIN wide wa ON wa.doc_id = doc_a
         |  JOIN wide wb ON wb.doc_id = doc_b
         |)
         |SELECT doc_a, doc_b, hamming FROM ham
         |WHERE hamming <= $DctHamT ORDER BY doc_a, doc_b""".stripMargin,
    "mm_shard_manifest" ->
      s"""WITH a AS (
         |  SELECT doc_id, $mtSql AS media_type,
         |    octet_length(text::BLOB)::BIGINT AS n_bytes,
         |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % $SubShards AS sub
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, media_type, sub, n_bytes,
         |    sum(n_bytes) OVER (PARTITION BY media_type, sub ORDER BY doc_id) AS cum
         |  FROM a
         |), g AS (
         |  SELECT media_type, sub, n_bytes, doc_id,
         |    floor((cum - n_bytes) / $ShardBudget.0)::BIGINT AS shard_seq
         |  FROM c
         |)
         |SELECT media_type, sub, shard_seq, count(*) AS n_assets,
         |  sum(n_bytes)::BIGINT AS shard_bytes,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM g GROUP BY media_type, sub, shard_seq
         |ORDER BY media_type, sub, shard_seq""".stripMargin,
    "mm_phash_neardup" ->
      s"""WITH a AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE octet_length(text::BLOB) >= $PhashMinBytes
         |), sm AS (
         |  SELECT doc_id, i,
         |    ascii(substr(text,
         |      ((i * (length(text) - 1)) // ${PhashBits - 1} + 1)::INT, 1))::BIGINT
         |      AS sample
         |  FROM a, range($PhashBits) r(i)
         |), ws AS (
         |  SELECT doc_id, i, sample,
         |    sum(sample) OVER (PARTITION BY doc_id) AS ssum
         |  FROM sm
         |), bits AS (
         |  SELECT doc_id, i,
         |    CASE WHEN sample * $PhashBits > ssum THEN 1 ELSE 0 END AS bit
         |  FROM ws
         |), bands AS (
         |  SELECT doc_id, (i // $PhashBandBits)::INT AS band_idx,
         |    sum(bit * (1::BIGINT << (${PhashBandBits - 1} - (i % $PhashBandBits))::INT))::BIGINT
         |      AS band_val
         |  FROM bits GROUP BY doc_id, i // $PhashBandBits
         |), wide AS (
         |  SELECT doc_id, list(band_val ORDER BY band_idx) AS bands
         |  FROM bands GROUP BY doc_id
         |), cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
         |      AND x.doc_id < y.doc_id
         |), ham AS (
         |  SELECT doc_a, doc_b,
         |    (bit_count(xor(wa.bands[1], wb.bands[1]))
         |     + bit_count(xor(wa.bands[2], wb.bands[2]))
         |     + bit_count(xor(wa.bands[3], wb.bands[3]))
         |     + bit_count(xor(wa.bands[4], wb.bands[4])))::INT AS hamming
         |  FROM cand
         |  JOIN wide wa ON wa.doc_id = doc_a
         |  JOIN wide wb ON wb.doc_id = doc_b
         |)
         |SELECT doc_a, doc_b, hamming FROM ham
         |WHERE hamming <= $PhashHamT ORDER BY doc_a, doc_b""".stripMargin,
    "mm_phash_dedup" ->
      s"""WITH a AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE octet_length(text::BLOB) >= $PhashMinBytes
         |), sm AS (
         |  SELECT doc_id, i,
         |    ascii(substr(text,
         |      ((i * (length(text) - 1)) // ${PhashBits - 1} + 1)::INT, 1))::BIGINT
         |      AS sample
         |  FROM a, range($PhashBits) r(i)
         |), ws AS (
         |  SELECT doc_id, i, sample,
         |    sum(sample) OVER (PARTITION BY doc_id) AS ssum
         |  FROM sm
         |), bits AS (
         |  SELECT doc_id, i,
         |    CASE WHEN sample * $PhashBits > ssum THEN 1 ELSE 0 END AS bit
         |  FROM ws
         |), bands AS (
         |  SELECT doc_id, (i // $PhashBandBits)::INT AS band_idx,
         |    sum(bit * (1::BIGINT << (${PhashBandBits - 1} - (i % $PhashBandBits))::INT))::BIGINT
         |      AS band_val
         |  FROM bits GROUP BY doc_id, i // $PhashBandBits
         |), wide AS (
         |  SELECT doc_id, list(band_val ORDER BY band_idx) AS bands
         |  FROM bands GROUP BY doc_id
         |), g AS (
         |  SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n_merged
         |  FROM wide GROUP BY bands
         |)
         |SELECT doc_id, n_merged FROM g
         |UNION ALL
         |SELECT doc_id, 1::BIGINT AS n_merged FROM documents
         |WHERE octet_length(text::BLOB) < $PhashMinBytes
         |ORDER BY doc_id""".stripMargin,
    "mm_wav_downsample" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text)::BIGINT AS n FROM documents
         |  WHERE length(text) > 0
         |), s AS (
         |  SELECT doc_id, n, i,
         |    ((ascii(substr(text, (i + 1)::INT, 1)) - 128) * 256)::BIGINT AS a
         |  FROM (SELECT doc_id, n, text, unnest(range(n)) AS i FROM d)
         |), o AS (
         |  SELECT doc_id, i // $WavDecim AS j, sum(a) AS ts
         |  FROM s WHERE i // $WavDecim < n // $WavDecim
         |  GROUP BY doc_id, i // $WavDecim
         |), oo AS (
         |  SELECT doc_id, abs(ts // $WavDecim) AS ad FROM o
         |), ain AS (
         |  SELECT doc_id, n AS n_in, sum(abs(a))::BIGINT AS sin
         |  FROM s GROUP BY doc_id, n
         |), aout AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_out, sum(ad)::BIGINT AS sout,
         |    max(ad)::BIGINT AS pk
         |  FROM oo GROUP BY doc_id
         |)
         |SELECT ain.doc_id, n_in, coalesce(n_out, 0)::BIGINT AS n_out,
         |  coalesce(pk, 0)::BIGINT AS peak_out,
         |  round(sin::DOUBLE / n_in, 6) AS mean_abs_in,
         |  CASE WHEN coalesce(n_out, 0) = 0 THEN 0.0
         |    ELSE round(sout::DOUBLE / n_out, 6) END AS mean_abs_out
         |FROM ain LEFT JOIN aout USING (doc_id) ORDER BY ain.doc_id""".stripMargin,
    "mm_scene_cut" ->
      s"""WITH a AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE $mtSql = 'video' AND length(text) >= $SceneFrameBytes
         |), fidx AS (
         |  SELECT doc_id, text,
         |    unnest(range(length(text) // $SceneFrameBytes)) AS f
         |  FROM a
         |), sm AS (
         |  SELECT doc_id, f, i,
         |    ascii(substr(text,
         |      (f * $SceneFrameBytes +
         |       (i * ${SceneFrameBytes - 1}) // ${PhashBits - 1} + 1)::INT, 1))::BIGINT
         |      AS sample
         |  FROM (SELECT doc_id, text, f, unnest(range($PhashBits)) AS i FROM fidx)
         |), bits AS (
         |  SELECT doc_id, f, i,
         |    CASE WHEN sample * $PhashBits >
         |      sum(sample) OVER (PARTITION BY doc_id, f) THEN 1 ELSE 0 END AS bit
         |  FROM sm
         |), ham AS (
         |  SELECT doc_id, f, bit,
         |    lag(bit) OVER (PARTITION BY doc_id, i ORDER BY f) AS pbit
         |  FROM bits
         |), cuts AS (
         |  SELECT doc_id, f,
         |    CASE WHEN f > 0 AND sum(abs(bit - pbit)) > $SceneCutThr
         |      THEN 1 ELSE 0 END AS cut
         |  FROM ham GROUP BY doc_id, f
         |), sc AS (
         |  SELECT doc_id, f,
         |    sum(cut) OVER (PARTITION BY doc_id ORDER BY f) AS scene
         |  FROM cuts
         |), sl AS (
         |  SELECT doc_id, scene, count(*)::BIGINT AS len
         |  FROM sc GROUP BY doc_id, scene
         |)
         |SELECT doc_id, sum(len)::BIGINT AS n_frames, count(*)::BIGINT AS n_scenes,
         |  max(len)::BIGINT AS longest_scene,
         |  round(sum(len)::DOUBLE / count(*), 4) AS avg_scene_len
         |FROM sl GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "mm_meta_stats" ->
      s"""SELECT media_type, count(*) AS n,
         |  sum(octet_length(payload))::BIGINT AS total_bytes,
         |  round(sum(octet_length(payload))::DOUBLE / count(*), 6) AS avg_bytes,
         |  max(octet_length(payload))::INT AS max_bytes
         |FROM (SELECT $mtSql AS media_type, text::BLOB AS payload FROM documents)
         |GROUP BY media_type ORDER BY media_type""".stripMargin,
    "mm_decode_features" ->
      s"""SELECT doc_id, $mtSql AS media_type, octet_length(text::BLOB)::INT AS n_bytes,
         |  lower(hex(substr(text, 1, 8)::BLOB)) AS header_hex,
         |  md5(text) AS checksum
         |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      s"""WITH f AS (
         |  SELECT doc_id, $mtSql AS media_type,
         |    unnest(range(CAST(ceil(length(text)::DOUBLE / $FrameBytes) AS BIGINT))) AS i,
         |    text
         |  FROM documents
         |), fr AS (
         |  SELECT doc_id, media_type, i::INT AS frame_idx,
         |    substr(text, (i * $FrameBytes + 1)::INT, $FrameBytes) AS frame
         |  FROM f WHERE i % $FrameStride = 0
         |)
         |SELECT doc_id, media_type, frame_idx,
         |  octet_length(frame::BLOB)::INT AS frame_bytes, md5(frame) AS frame_md5
         |FROM fr ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_frame_dedup" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    unnest(range(CAST(ceil(length(text)::DOUBLE / $FrameBytes) AS BIGINT))) AS i,
         |    text
         |  FROM documents
         |), fr AS (
         |  SELECT doc_id, i::INT AS frame_idx,
         |    md5(substr(text, (i * $FrameBytes + 1)::INT, $FrameBytes)) AS frame_md5
         |  FROM f
         |), g AS (
         |  SELECT frame_md5, doc_id, frame_idx,
         |    row_number() OVER (PARTITION BY frame_md5 ORDER BY doc_id, frame_idx) AS rnk,
         |    count(*) OVER (PARTITION BY frame_md5) AS n_copies
         |  FROM fr
         |)
         |SELECT frame_md5, doc_id AS first_doc, frame_idx AS first_idx, n_copies
         |FROM g WHERE rnk = 1 ORDER BY first_doc, first_idx""".stripMargin,
    "mm_resize" ->
      s"""WITH r AS (
         |  SELECT doc_id, $mtSql AS media_type, length(text) AS orig_bytes,
         |    list_aggregate(list_apply(range(CAST(ceil(length(text)::DOUBLE / $FrameStride) AS BIGINT)),
         |      i -> substr(text, (i * $FrameStride + 1)::INT, 1)), 'string_agg', '') AS resized
         |  FROM documents
         |)
         |SELECT doc_id, media_type, orig_bytes::INT AS orig_bytes,
         |  length(resized)::INT AS resized_bytes, md5(resized) AS resized_md5
         |FROM r ORDER BY doc_id""".stripMargin,
    "mm_typed_decode" ->
      s"""WITH t AS (
         |  SELECT doc_id, $mtSql AS media_type, text,
         |    CASE WHEN $mtSql IN ('image', 'video') THEN 3
         |         WHEN $mtSql = 'audio' THEN 2 ELSE 1 END AS nch
         |  FROM documents
         |), b0 AS (
         |  SELECT doc_id, nch, text, unnest(range(length(text))) AS i FROM t
         |), b AS (
         |  SELECT doc_id, ((i - 8) % nch)::INT AS ch,
         |    ascii(substr(text, (i + 1)::INT, 1)) AS bv
         |  FROM b0 WHERE i >= 8
         |), m AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN ch = 0 THEN bv END)::DOUBLE
         |      / nullif(count(CASE WHEN ch = 0 THEN bv END), 0) AS m0,
         |    sum(CASE WHEN ch = 1 THEN bv END)::DOUBLE
         |      / nullif(count(CASE WHEN ch = 1 THEN bv END), 0) AS m1,
         |    sum(CASE WHEN ch = 2 THEN bv END)::DOUBLE
         |      / nullif(count(CASE WHEN ch = 2 THEN bv END), 0) AS m2
         |  FROM b GROUP BY doc_id
         |)
         |SELECT t.doc_id, media_type, length(text)::INT AS n_bytes,
         |  lower(hex(substr(text, 1, 4)::BLOB)) AS magic_hex,
         |  nch::INT AS n_channels,
         |  round(coalesce(m0, 0.0), 6) AS ch0_mean,
         |  round(coalesce(m1, 0.0), 6) AS ch1_mean,
         |  round(coalesce(m2, 0.0), 6) AS ch2_mean,
         |  md5(text) AS checksum
         |FROM t LEFT JOIN m ON m.doc_id = t.doc_id
         |ORDER BY t.doc_id""".stripMargin)
}
