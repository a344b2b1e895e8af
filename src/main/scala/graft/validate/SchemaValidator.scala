package graft.validate

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema + rule validation with valid/invalid routing (SURVEY §2.2 P1).
  *
  * The reference's validation stage (SDP.py:243-255) reads schemas from a
  * config bucket and emits `is_valid` which the orchestrator's Choice
  * routes on (SDP.py:404-408 `$.validation_result.is_valid`). Here:
  *
  *  - '''parse-level''' validation uses Spark's PERMISSIVE JSON mode with
  *    `_corrupt_record` — malformed payloads survive as rows and route to
  *    the invalid side instead of killing the batch;
  *  - '''rule-level''' validation evaluates declarative [[Column]]
  *    predicates; each failed rule's name lands in an `errors` array and
  *    `is_valid = (errors is empty)`.
  *
  * Everything is Column expressions — codegen'd, no UDFs, scales linearly
  * with the scan (the validation pass adds no shuffle).
  */
object SchemaValidator {

  val CorruptCol = "_corrupt_record"
  val IsValidCol = "is_valid"
  val ErrorsCol  = "errors"

  /** A named validation rule; `predicate` must be true for a valid row. */
  final case class Rule(name: String, predicate: Column)

  /** Parse raw JSON strings against a declared schema (PERMISSIVE): rows
    * that fail to parse keep their raw payload in `_corrupt_record` and
    * get `is_valid = false` with a "malformed_json" error. */
  def parseJson(raw: Dataset[String], schema: StructType): DataFrame = {
    val withCorrupt = schema.add(CorruptCol, "string")
    val parsed = raw.sparkSession.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(raw)
    parsed
      .withColumn(ErrorsCol,
        when(col(CorruptCol).isNotNull, array(lit("malformed_json")))
          .otherwise(array().cast("array<string>")))
      .withColumn(IsValidCol, col(CorruptCol).isNull)
  }

  /** Evaluate rules, appending `errors: array<string>` (names of failed
    * rules, in declaration order) and `is_valid`. Null predicate results
    * count as failures (SQL three-valued logic would otherwise let nulls
    * slip through the gate). */
  def applyRules(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val errs = rules.map(r => when(!coalesce(r.predicate, lit(false)), r.name))
    val existing = if (df.columns.contains(ErrorsCol)) col(ErrorsCol)
                   else array().cast("array<string>")
    df.withColumn(ErrorsCol,
        filter(concat(existing, array(errs: _*)), e => e.isNotNull))
      .withColumn(IsValidCol, size(col(ErrorsCol)) === 0)
  }

  /** Split into (valid, invalid) — the ValidationChoice routing of
    * SDP.py:404-408. Both sides share the validated plan; Spark reuses the
    * scan (and the caller may cache upstream if both sides are consumed). */
  def route(validated: DataFrame): (DataFrame, DataFrame) =
    (validated.filter(col(IsValidCol)), validated.filter(!col(IsValidCol)))
}
