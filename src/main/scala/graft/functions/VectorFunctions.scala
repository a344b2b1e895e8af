package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY §2.7 [N]).
  *
  * Everything here composes Spark's codegen'd higher-order functions —
  * `transform` / `zip_with` / `aggregate` — so the hot path stays inside
  * whole-stage codegen with zero UDFs and no per-row boxing beyond the
  * array itself. Accumulation is in DOUBLE, element order, which the
  * DuckDB oracle reproduces exactly (`list_sum(list_transform(...))` over
  * the same element order) — bitwise-comparable results.
  *
  * At 100 TB these are the inner kernels of the similarity operators
  * ([[graft.similarity.Similarity]]); they run per-row with no shuffle.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision, sequential element order. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ in double precision. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity in double precision. Null/zero-norm safe: returns
    * NULL if either norm is 0 (division by zero yields NULL via nullif). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  private def nullif(c: Column, v: Column): Column = when(c === v, lit(null)).otherwise(c)
}
