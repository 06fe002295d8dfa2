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

  test("orc round-trip preserves rows; predicate + projection reach the scan") {
    val src = Tables.documents(spark, dir)
      .select("doc_id", "lang", "source", "n_chars")
    val want = src.orderBy("doc_id").collect().toSeq

    val orcOut = "/tmp/graft-src-orc"
    src.write.mode("overwrite").orc(orcOut)
    val back = spark.read.orc(orcOut)
    assert(back.schema === src.schema)
    assert(back.orderBy("doc_id").collect().toSeq === want)

    // ORC is the columnar alternative a warehouse migration hits first:
    // the same pushdown/pruning contract as parquet must hold — the
    // filter lands in PushedFilters and the projection in ReadSchema.
    val pruned = back.filter(col("n_chars") >= 500).select("doc_id", "n_chars")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), scan)
    assert(scan.contains("GreaterThanOrEqual(n_chars,500)"), scan)
  }
}
