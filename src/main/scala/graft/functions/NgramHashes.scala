package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native windowed n-gram hasher: one value per byte position `i` of the
  * input — `h1(i)·2³¹ + h2(i)`, where `h1`/`h2` are polynomial hashes of
  * the n bytes starting at `i` under two different bases mod 2³¹−1. The
  * two 31-bit lanes make a 62-bit gram id, so unequal grams collide with
  * ~2⁻⁶² probability — safe to treat as an interned gram identity at any
  * corpus size (byte ≡ character code for ASCII, the fixture contract
  * shared with [[RollingHash]]).
  *
  * Replaces one md5 digest PER CHARACTER POSITION in the character-n-gram
  * Jaccard pipeline (graft.ops.Dedup.ngramJaccard): the md5 interning was
  * the dominant cost of the whole query. Same design rationale as
  * [[RollingHash]] — the equivalent higher-order-function construction is
  * CodegenFallback with a per-position lambda and string allocation, while
  * this emits a tight two-level byte loop inside WholeStageCodegen.
  */
case class NgramHashes(child: Expression, n: Int, base1: Long, base2: Long, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"ngram_hashes requires a string argument, got ${child.dataType.catalogString}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"ngram_hashes window must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val m = bytes.length - n + 1
    if (m <= 0) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](m)
      var i = 0
      while (i < m) {
        var h1 = 0L
        var h2 = 0L
        var j = 0
        while (j < n) {
          val b = bytes(i + j) & 0xff
          h1 = (h1 * base1 + b) % mod
          h2 = (h2 * base2 + b) % mod
          j += 1
        }
        out(i) = h1 * 2147483648L + h2
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val b = ctx.freshName("b")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $m = $bytes.length - $n + 1;
         |if ($m < 0) $m = 0;
         |long[] $out = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $h1 = 0L;
         |  long $h2 = 0L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    int $b = $bytes[$i + $j] & 0xff;
         |    $h1 = ($h1 * ${base1}L + $b) % ${mod}L;
         |    $h2 = ($h2 * ${base2}L + $b) % ${mod}L;
         |  }
         |  $out[$i] = $h1 * 2147483648L + $h2;
         |}
         |${ev.value} = ${classOf[UnsafeArrayData].getName}.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

object NgramHashes {
  val DefaultBase1 = 131L
  val DefaultBase2 = 257L
  val DefaultMod = 2147483647L // 2^31 - 1, shared with RollingHash

  private val info = new ExpressionInfo(classOf[NgramHashes].getName, "ngram_hashes")
  private val builder = (children: Seq[Expression]) => {
    require(children.size == 2, "ngram_hashes takes (string, n)")
    require(children(1).foldable, "ngram_hashes window size must be a literal")
    val n = children(1).eval().asInstanceOf[Number].intValue
    NgramHashes(children.head, n, DefaultBase1, DefaultBase2, DefaultMod)
  }

  /** Register `ngram_hashes(str, n)` in an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("ngram_hashes"), info, builder)
}
