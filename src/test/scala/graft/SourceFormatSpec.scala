package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond the reference's whole-file text:
  * query results round-trip through CSV and JSON-lines with schema intact,
  * and the JSON source prunes columns at the scan like parquet does.
  */
class SourceFormatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("csv and json round-trips preserve rows and schema") {
    val src = Tables.documents(spark, dir)
      .select("doc_id", "lang", "source", "n_chars")
    val want = src.orderBy("doc_id").collect().toSeq

    val csvOut = "/tmp/graft-src-csv"
    src.write.mode("overwrite").option("header", "true").csv(csvOut)
    val csvBack = spark.read.option("header", "true")
      .schema(src.schema).csv(csvOut)
    assert(csvBack.orderBy("doc_id").collect().toSeq === want)

    val jsonOut = "/tmp/graft-src-json"
    src.write.mode("overwrite").json(jsonOut)
    val jsonBack = spark.read.schema(src.schema).json(jsonOut)
    assert(jsonBack.orderBy("doc_id").collect().toSeq === want)

    // column pruning reaches the json scan: 2-column read schema
    val pruned = spark.read.schema(src.schema).json(jsonOut)
      .filter(col("lang") === "en").select("doc_id", "lang")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), scan)
  }
}
