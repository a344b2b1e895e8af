package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Spark ships no normalization builtin, yet corpus curation needs one:
  * the same visible text arrives as precomposed (é = U+00E9) or combining
  * (e + U+0301) codepoints depending on the source, and every downstream
  * fingerprint/dedup/token operator treats those byte sequences as
  * distinct documents. Normalizing at ingest (SURVEY §2.2 cleaning) makes
  * text identity canonical before anything hashes it.
  *
  * A Scala UDF would deserialize to String per row outside codegen; this
  * expression participates in whole-stage codegen and keeps a fast path —
  * `Normalizer.isNormalized` is a scan-only check (true for all-ASCII and
  * for already-composed text, i.e. almost every row), so the allocating
  * `normalize` call runs only on rows that actually need rewriting.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-facing wrappers for the native string expressions. */
object StringFunctions {
  import org.apache.spark.sql.{Column, GraftColumnBridge}

  /** Unicode NFC normalization (native, codegen'd). */
  def nfc(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
}

object NfcNormalize {
  /** Static helper called from generated code (the companion's static
    * forwarder makes `graft.functions.NfcNormalize.normalize` a plain
    * Java static call). Returns the INPUT object untouched when already
    * normalized — no allocation on the common path. */
  def normalize(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
