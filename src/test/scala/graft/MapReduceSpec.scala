package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.core.MapReduce

/** Mirror of the reference's end-to-end golden test
  * (/root/reference/src/mapreduce/common_test_suite.go:53-114): integers
  * 0..99 split across input files must come back as exactly 100
  * STRING-sorted `"key: value"` lines — plus equivalence checks across the
  * three reduce paths (mapGroups, combiner, explicit-nReduce) and
  * tokenizer invariants.
  */
class MapReduceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** MakeInputs parity: 0..99 one per line, contiguous across `num` files. */
  private def makeInputs(dir: Path, num: Int): Unit =
    (0 until num).foreach { f =>
      val lines = (0 until 100).filter(_ % num == f).mkString("\n")
      Files.writeString(dir.resolve(s"824-mrinput-$f.txt"), lines + "\n")
    }

  test("reference golden: whole-file input -> sorted distinct tokens -> merged text file") {
    val dir = Files.createTempDirectory("mrgolden")
    makeInputs(dir, 5)
    val input = MapReduce.textFiles(spark, s"$dir/824-mrinput-*.txt")
    assert(input.count() === 5) // one record per file, DoMap granularity

    val result = MapReduce.distinctTokens(spark, input)
    val rows = result.collect()
    val expected = (0 until 100).map(_.toString).sorted // STRING sort: 0,1,10,...
    assert(rows.map(_._1).toSeq === expected)
    assert(rows.forall(_._2 === ""))

    val out = dir.resolve("merged").toString
    MapReduce.writeMergedText(result, out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".txt"))
    assert(files.length === 1) // single merged file, MergeResultName contract
    val lines = spark.read.textFile(out).collect().toSeq
    assert(lines === expected.map(k => s"$k: "))
  }

  test("combiner and nReduce paths agree with the mapGroups path on word count") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) => (s"doc-$id", text) }
    val viaGroups = MapReduce.mapReduce(spark, docs,
      (_: String, c: String) => c.split(MapReduce.WhitespaceClass).iterator
        .filter(_.nonEmpty).map(w => (w, "1")),
      (_: String, vs: Iterator[String]) => vs.map(_.toLong).sum.toString).collect()
    val viaCombine = MapReduce.wordCount(spark, docs).collect()
    val viaNReduce = MapReduce.wordCountNReduce(spark, docs, nReduce = 3).collect()
    assert(viaCombine.toSeq === viaGroups.toSeq)
    assert(viaNReduce.toSeq === viaGroups.toSeq)
  }

  test("nReduce path produces exactly nReduce shuffle partitions before the final sort") {
    import spark.implicits._
    val input = Seq(("f", (1 to 50).map(i => s"w$i").mkString(" "))).toDS()
    val plan = MapReduce.mapReduce(spark, input,
      (_: String, c: String) => c.split(" ").iterator.map(w => (w, "1")),
      (_: String, vs: Iterator[String]) => vs.size.toString,
      nReduce = 7).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(_1#") && plan.contains(", 7)"),
      s"expected hashpartitioning(..., 7) in plan:\n$plan")
  }

  test("tokenizer: splits on ASCII whitespace, drops empties, preserves token order") {
    val token = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val ws = Gen.nonEmptyListOf(Gen.oneOf(' ', '\t', '\n', '\f', '\r')).map(_.mkString)
    val prop = Prop.forAll(Gen.listOf(token), ws) { (toks, sep) =>
      val contents = sep + toks.mkString(sep) + sep // leading/trailing ws too
      val got = contents.split(MapReduce.WhitespaceClass).filter(_.nonEmpty).toList
      got == toks
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}
