package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY §2.7 [N]).
  *
  * `dot` and `cosine` are native codegen'd Catalyst expressions
  * ([[DotProduct]], [[CosineSimilarity]]) — one primitive Java loop per
  * row inside whole-stage codegen, no UDFs, no boxing. Accumulation is
  * in DOUBLE, element order, which the DuckDB oracle reproduces exactly
  * (`list_sum(list_transform(...))` over the same element order) —
  * bitwise-comparable results.
  *
  * At 100 TB these are the inner kernels of the similarity operators
  * ([[graft.similarity.Similarity]]); they run per-row with no shuffle.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision, sequential element order (native). */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** ‖a‖₂ in double precision (HOF form — not on any hot path). */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity in double precision (native). NULL if either norm
    * is 0. */
  def cosine(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
