package graft

import java.io.File
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB output story: results land as parquet partitioned by a query
  * column, and readers that filter on it must scan only the matching
  * directories (PartitionFilters, not data filters). */
class PartitionedSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("partitionBy sink + partition-pruned read-back") {
    val out = "/tmp/graft-part-out"
    Tables.documents(spark, dir).select("doc_id", "lang", "n_chars")
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    assert(new File(out).listFiles().exists(_.getName.startsWith("lang=")))

    val en = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("= en"),
      s"partition pruning not engaged:\n$plan")
    // and the pruned filter is NOT re-checked as a data filter on rows
    assert(en.count() ===
      Tables.documents(spark, dir).filter(col("lang") === "en").count())
  }
}
