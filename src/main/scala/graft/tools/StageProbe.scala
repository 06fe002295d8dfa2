package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage shuffle/spill breakdown for ONE declared query — the
  * diagnostic behind targeted shuffle-fat hunts (the r16 verdict's
  * dd_ngram_jaccard item): run the query once, print every completed
  * stage's shuffle-write / shuffle-read / spill bytes and record counts
  * with the stage's callsite name, fattest first. Where Bench's per-query
  * totals say "9 GB", this says WHICH exchange.
  *
  * Usage: StageProbe <queryName> [sfDir]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dd_ngram_jaccard")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(id: Int, name: String, writeMb: Double, readMb: Double,
        spillMb: Double, recs: Long, tasks: Int, sec: Double)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) stages.synchronized {
          stages += St(e.stageInfo.stageId, e.stageInfo.name.take(120),
            m.shuffleWriteMetrics.bytesWritten / 1048576.0,
            m.shuffleReadMetrics.totalBytesRead / 1048576.0,
            (m.memoryBytesSpilled + m.diskBytesSpilled) / 1048576.0,
            m.shuffleWriteMetrics.recordsWritten,
            e.stageInfo.numTasks,
            e.stageInfo.completionTime.flatMap(c =>
              e.stageInfo.submissionTime.map(s => (c - s) / 1000.0)).getOrElse(-1))
        }
      }
    })
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    println(f"query=$name sf=$sfDir total=${sec}%.1fs stages=${stages.size}")
    println(f"${"id"}%5s ${"writeMB"}%10s ${"readMB"}%10s ${"spillMB"}%9s " +
      f"${"records"}%12s ${"tasks"}%6s ${"sec"}%7s  name")
    stages.sortBy(-_.writeMb).foreach { s =>
      println(f"${s.id}%5d ${s.writeMb}%10.1f ${s.readMb}%10.1f ${s.spillMb}%9.1f " +
        f"${s.recs}%12d ${s.tasks}%6d ${s.sec}%7.1f  ${s.name}")
    }
    val w = stages.map(_.writeMb).sum
    println(f"TOTAL shuffle-write ${w}%.1f MB")
    spark.stop()
  }
}
