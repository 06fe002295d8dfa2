package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Streaming throughput / state-size evidence (VERDICT r15 item 4): drive
  * the heaviest stateful twin — [[graft.streaming.Streaming.phashKeepViaState]],
  * one state row per DISTINCT aHash signature — with file-source
  * micro-batches at factor-1/10/100 ingest volume (the ScaleUp replica
  * dirs), and record per batch what the state-bound claims assert:
  *
  *  - rows/s (ingest throughput, trigger wall-clock),
  *  - state rows after every batch (must track the distinct-signature
  *    space, NOT history: the per-leg `state_rows / ingest_rows` ratio
  *    falls as volume grows if the bound is real),
  *  - state-store memory.
  *
  * Metrics come from the engine's own StreamingQueryProgress (input rows,
  * trigger durations, stateOperators), not wall-clock guesses. Sink is
  * `noop`; each leg gets a fresh checkpoint. Emits one JSON object —
  * `bench_streaming_r16.json`.
  *
  * Usage: StreamBench <outJson> [nChunks]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse("bench_streaming_r16.json")
    val nChunks = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val legs = Seq(
      ("1x", sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")),
      ("10x", sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "/root/repo/target/sf1")),
      ("100x", sys.env.getOrElse("SPARK_GRAFT_SF100_DIR", "/root/repo/target/sf10")))

    def jnum(d: Double): String = {
      val r = math.rint(d * 1000) / 1000
      if (r.isNaN || r.isInfinite) "0" else r.toString
    }

    val legJsons = legs.filter { case (_, dir) => Files.exists(Paths.get(dir)) }
      .map { case (label, dir) =>
        val work = Files.createTempDirectory(s"graft_sb_$label")
        val in = work.resolve("in").toString
        val ck = work.resolve("ck").toString
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"))
        // nChunks files -> nChunks micro-batches under maxFilesPerTrigger=1
        docs.repartition(nChunks).write.mode("overwrite").parquet(in)
        val stream = spark.readStream
          .schema(docs.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(in)
        val q = graft.streaming.Streaming.phashKeepViaState(spark, stream)
          .writeStream
          .format("noop")
          .outputMode("append")
          .option("checkpointLocation", ck)
          .start()
        q.processAllAvailable()
        val prog = q.recentProgress.toSeq
          .filter(_.numInputRows > 0)
        q.stop()
        val rows = prog.map(_.numInputRows)
        val secs = prog.map(p =>
          Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L) / 1000.0)
        val stateRows = prog.map(p =>
          if (p.stateOperators.nonEmpty) p.stateOperators(0).numRowsTotal else 0L)
        val stateMem = prog.map(p =>
          if (p.stateOperators.nonEmpty) p.stateOperators(0).memoryUsedBytes else 0L)
        val ingest = rows.sum
        val totalSec = secs.sum
        val finalState = if (stateRows.nonEmpty) stateRows.last else 0L
        spark.catalog.clearCache()
        s""""$label":{"dir":"$dir","ingest_rows":$ingest,"n_batches":${prog.size},""" +
          s""""total_sec":${jnum(totalSec)},"rows_per_sec":${jnum(ingest / math.max(totalSec, 1e-9))},""" +
          s""""state_rows_final":$finalState,""" +
          s""""state_rows_per_ingest":${jnum(finalState.toDouble / math.max(ingest, 1))},""" +
          s""""state_mem_mb_final":${jnum(if (stateMem.nonEmpty) stateMem.last / 1048576.0 else 0.0)},""" +
          s""""batch_rows":[${rows.mkString(",")}],""" +
          s""""batch_sec":[${secs.map(jnum).mkString(",")}],""" +
          s""""batch_state_rows":[${stateRows.mkString(",")}]}"""
      }
    val json = legJsons.mkString(
      s"""{"query":"phashKeepViaState","chunks_per_leg":$nChunks,""" +
        """"note":"file-source micro-batches, noop sink, fresh checkpoint per leg; state = one row per DISTINCT aHash signature, so state_rows_per_ingest must FALL as ingest grows if the bound is real",""",
      ",", "}")
    Files.writeString(Paths.get(outFile), json + "\n")
    println(json)
    spark.stop()
  }
}
