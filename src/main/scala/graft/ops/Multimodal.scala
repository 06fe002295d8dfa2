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

/** Output row of the stubbed decode — fixed schema, so the downstream plan
  * is fully typed regardless of what the real codec would emit.
  */
final case class DecodedAsset(doc_id: Long, media_type: String, n_bytes: Int,
    mean_byte: Double, checksum: String)

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

  private def decodeStub(a: MediaAsset): DecodedAsset = {
    var sum = 0L
    var i = 0
    while (i < a.payload.length) { sum += a.payload(i) & 0xff; i += 1 }
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(a.payload).map("%02x".format(_)).mkString
    DecodedAsset(a.doc_id, a.media_type, a.payload.length,
      sum.toDouble / a.payload.length, hex)
  }

  /** The typed decode pipeline: Dataset[MediaAsset] → mapPartitions(decode)
    * → Dataset[DecodedAsset]. mapPartitions gives the decoder one iterator
    * per parquet split — the JVM-side analogue of mapInPandas batches: codec
    * init (here: the MessageDigest) amortizes across the partition, and
    * parallelism = input splits, so a 100 TB decode scales with the scan.
    */
  def typedDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir).as[MediaAsset]
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .withColumn("mean_byte", round(col("mean_byte"), 6))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta_stats" -> (metaStats(_, _)),
    "mm_decode_features" -> (decodeFeatures(_, _)),
    "mm_frame_sample" -> (frameSample(_, _)),
    "mm_frame_dedup" -> (frameDedup(_, _)),
    "mm_resize" -> (resize(_, _)),
    "mm_typed_decode" -> (typedDecode(_, _)),
    "mm_shard_manifest" -> (shardManifest(_, _)))

  // ------------------------------------------------------------- oracle SQL

  private val mtSql =
    "(['image', 'audio', 'video', 'text'])[(substr(source, 4)::INT % 4) + 1]"

  val oracles: Map[String, String] = Map(
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
      s"""SELECT doc_id, $mtSql AS media_type,
         |  length(text)::INT AS n_bytes,
         |  round(list_sum(list_apply(range(length(text)),
         |    i -> ascii(substr(text, (i + 1)::INT, 1))))::DOUBLE / length(text), 6) AS mean_byte,
         |  md5(text) AS checksum
         |FROM documents ORDER BY doc_id""".stripMargin)
}
