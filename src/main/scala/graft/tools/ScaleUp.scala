package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-probe dataset generator: writes a `factor`× replica of a testdata
  * directory so the heavy queries can be measured at 10× volume
  * (`bench_scaling_r14.json` — the measured evidence behind the
  * 100×-design claims, VERDICT r13 next-round item 3).
  *
  * The construction matters more than the copying: a naive k-fold replica
  * makes every document an exact/near duplicate of its k−1 clones, so
  * candidate-pair counts grow ~k² BY CONSTRUCTION and the probe would
  * measure the synthetic duplicate densification, not the engine's volume
  * scaling. Instead each copy is the base corpus with its STRUCTURE intact
  * and its cross-copy overlap destroyed:
  *
  *  - documents: copy c ≥ 1 appends a copy tag to every token (`tokens`
  *    splits on whitespace, so `foo` → `fooqc1` stays one token). Every
  *    shingle/trigram/bigram/simhash/window digest within a copy relates
  *    exactly as in the base corpus; across copies the vocabularies are
  *    disjoint, so exact/minhash/simhash/n-gram/substring dedup find the
  *    SAME duplicate density per unit of data at any factor. doc_ids shift
  *    by c·stride; n_chars is recomputed from the rewritten text.
  *  - embeddings: copy c rotates each vector cyclically by (c·7 mod Dim)
  *    lanes. Rotation is an orthogonal transform applied uniformly within
  *    the copy: every within-copy dot product / norm / cosine is EXACTLY
  *    the base corpus's, while cross-copy cosines decorrelate (the demo
  *    query set `vec_id < 8` lives in the untouched copy 0).
  *  - every other table (lineitem for the bench sentinel, region for
  *    warmup, events etc.) is carried over unchanged — the probe's top-10
  *    queries read only documents + embeddings.
  *
  * Usage: ScaleUp <srcDir> <outDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    // stride leaves the base id space intact and keeps ids dense-ish —
    // deterministic winner election (min doc_id) behaves as in the base
    val docStride = docs.agg(max("doc_id")).head.getLong(0) + 1
    def docCopy(c: Int): DataFrame =
      if (c == 0) docs
      else {
        val tagged = regexp_replace(col("text"), "(\\S+)", s"$$1qc$c")
        docs.select(
          (col("doc_id") + lit(c * docStride)).as("doc_id"),
          tagged.as("text"),
          col("lang"), col("source"),
          length(tagged).cast("long").as("n_chars"))
      }
    (0 until factor).map(docCopy).reduce(_ unionAll _)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val vecStride = emb.agg(max("vec_id")).head.getLong(0) + 1
    val dim = graft.ops.Similarity.Dim
    def embCopy(c: Int): DataFrame =
      if (c == 0) emb
      else {
        val r = (c * 7) % dim
        val rotated =
          if (r == 0) col("embedding")
          else concat(slice(col("embedding"), r + 1, dim - r),
            slice(col("embedding"), 1, r))
        emb.select(
          (col("vec_id") + lit(c * vecStride)).as("vec_id"),
          rotated.as("embedding"), col("label"))
      }
    (0 until factor).map(embCopy).reduce(_ unionAll _)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // carry the remaining tables over unchanged
    val src = new java.io.File(srcDir)
    src.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.getName)
      .filterNot(n => n == "documents.parquet" || n == "embeddings.parquet")
      .foreach { n =>
        spark.read.parquet(s"$srcDir/$n")
          .write.mode("overwrite").parquet(s"$outDir/$n")
      }
    spark.stop()
  }
}
