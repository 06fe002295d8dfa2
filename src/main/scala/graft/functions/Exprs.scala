package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small shared Column combinators used across operator modules. */
object Exprs {

  /** `sequence(from, to)` guarded for the degenerate range.
    *
    * Spark's `sequence()` defaults its step to -1 whenever `to < from`, so
    * the natural "0 until n" generator `sequence(0, n - 1)` silently yields
    * `[0, -1]` — two phantom elements — when `n == 0`. That bug class bit
    * twice (Multimodal frame generators, commit ac425a4) because each call
    * site carried its own guard five lines from the generator. This helper
    * fuses guard and generator: `to < from` returns an EMPTY array (typed
    * by the inputs — `slice(sequence(from, from), 1, 0)` — so int and long
    * bounds both work), so `posexplode` fans out zero rows and `transform`
    * maps to an empty array — matching what DuckDB's half-open `range(n)`
    * does for `n = 0`.
    */
  def boundedSequence(from: Column, to: Column): Column = {
    // null-safe empty branch: a null `from` must still yield an empty
    // array (not NULL — transform(NULL) propagates the phantom behavior
    // this helper closes)
    val f0 = coalesce(from, lit(0))
    when(to >= from, sequence(from, to))
      .otherwise(slice(sequence(f0, f0), 1, 0))
  }
}
