package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely from
  * Catalyst higher-order functions (`zip_with` + `aggregate`) — no UDFs, so
  * the expressions stay native, null-safe, and usable from pure SQL.
  *
  * Floats are widened to double *before* multiplication and summed in strict
  * left-to-right array order, which makes the result deterministic and
  * reproducible by the DuckDB oracle (same widening, same order).
  */
object VectorFunctions {

  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product — sequential left-to-right summation, deterministic.
    * Backed by the codegen'd [[DotProduct]] expression (the HOF
    * `aggregate(zip_with(...))` formulation is ~50× slower per pair). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge._
    column(DotProduct(expression(asDouble(a)), expression(asDouble(b))))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; callers should pre-filter zero-norm vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine rounded to 4 decimals — the canonical comparable form used by
    * every query that hash-checks similarity values (SURVEY.md §2.12 Q14). */
  def cosine4(a: Column, b: Column): Column = round(cosine(a, b), 4)

  // ---------------------------------------------------- DuckDB oracle side

  /** DuckDB rendering of the same dot product (cast to DOUBLE[] first). */
  def duckDot(a: String, b: String): String =
    s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  def duckCosine4(a: String, b: String): String =
    s"round(${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)})), 4)"
}
