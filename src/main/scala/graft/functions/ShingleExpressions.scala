package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word 3-gram shingle set of a NORMALIZED (lower-cased,
  * space-trimmed) string, as one native expression.
  *
  * Semantics contract — byte-identical to the interpreted pipeline it
  * replaces (round 14 optimization; guide §4 "eliminate non-codegen
  * expressions in the hot path"):
  *
  * {{{
  *   array_distinct(filter(zip_with(zip_with(toks, slice(toks,2,..),
  *     (a,b) => concat_ws(" ",a,b)), slice(toks,3,..),
  *     (ab,c) => concat_ws(" ",ab,c)), notNull))
  *   where toks = split(regexp_replace(input, "\\s+", " "), " ", -1)
  * }}}
  *
  * The caller supplies `lower(trim(text))` as the child (Spark's own
  * codegen'd builtins, so Unicode case mapping and trim semantics stay
  * THE ENGINE'S, not a re-implementation); this expression replicates the
  * remaining ASCII-only steps exactly:
  *
  *  - Java regex `\s` matches only `[ \t\n\x0B\f\r]` (no UNICODE_CHARACTER_CLASS),
  *    all single ASCII bytes, so whitespace-run collapsing is byte-exact
  *    on UTF-8 (multi-byte sequences never contain bytes < 0x80);
  *  - `split(" ", -1)` on the collapsed string keeps a leading empty
  *    token (input starting with whitespace) and a trailing empty token
  *    (input ending with whitespace), and yields `[""]` on empty input —
  *    all reproduced by the span scan below;
  *  - `concat_ws(" ", a, b, c)` on never-null tokens is plain
  *    space-joining (empty tokens are kept, exactly as concat_ws keeps
  *    empty strings);
  *  - `array_distinct` keeps first-occurrence order — reproduced by the
  *    insert-ordered set.
  *
  * Replaces: one regexp_replace pass, a 6-pass interpreted HOF chain
  * (2 slice, 2 zip_with, filter, array_distinct) and per-gram concat_ws
  * allocations with a single byte scan per row. The old pipeline remains
  * in [[graft.dedup.Dedup.shingles]] for token-array call sites and as
  * the equivalence spec's reference implementation.
  */
case class WordShingles(child: Expression) extends UnaryExpression {
  // containsNull = true matches the HOF pipeline's type exactly
  // (zip_with→filter→array_distinct keeps nullable elements in the type
  // even though no null survives the filter) — downstream schemas stay
  // byte-identical to the pre-optimization plans
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs a string input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.shingle($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  /** Java regex `\s` without UNICODE_CHARACTER_CLASS. */
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** Static helper called from generated code. One pass: token spans
    * (split-on-collapsed-whitespace with the leading/trailing empty-token
    * rule), then distinct 3-grams in first-occurrence order. */
  def shingle(u: UTF8String): ArrayData = {
    val b = u.getBytes
    val nb = b.length
    // token spans over the raw bytes; (-1, 0) encodes an empty token
    var starts = new Array[Int](16)
    var lens = new Array[Int](16)
    var ntok = 0
    def push(s: Int, l: Int): Unit = {
      if (ntok == starts.length) {
        starts = java.util.Arrays.copyOf(starts, ntok * 2)
        lens = java.util.Arrays.copyOf(lens, ntok * 2)
      }
      starts(ntok) = s; lens(ntok) = l; ntok += 1
    }
    if (nb == 0) push(0, 0) // split("") = [""]
    else {
      if (isWs(b(0))) push(0, 0) // leading whitespace → leading empty token
      var i = 0
      while (i < nb) {
        if (isWs(b(i))) i += 1
        else {
          val s = i
          while (i < nb && !isWs(b(i))) i += 1
          push(s, i - s)
        }
      }
      if (isWs(b(nb - 1))) push(0, 0) // trailing whitespace → trailing empty token
    }
    if (ntok < 3) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[UTF8String](ntok * 2)
    var g = 0
    while (g + 2 < ntok) {
      val l0 = lens(g); val l1 = lens(g + 1); val l2 = lens(g + 2)
      val out = new Array[Byte](l0 + l1 + l2 + 2)
      System.arraycopy(b, starts(g), out, 0, l0)
      out(l0) = 0x20
      System.arraycopy(b, starts(g + 1), out, l0 + 1, l1)
      out(l0 + 1 + l1) = 0x20
      System.arraycopy(b, starts(g + 2), out, l0 + 2 + l1, l2)
      seen.add(UTF8String.fromBytes(out))
      g += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}

/** Column-facing wrapper for the native shingle expression. */
object ShingleFunctions {
  import org.apache.spark.sql.{Column, GraftColumnBridge}
  import org.apache.spark.sql.functions.{lower, trim}

  /** Distinct word 3-gram shingles of raw document text — the native
    * form of `Dedup.shingles(TextAnalysis.tokens(text))` (normalization
    * stays on Spark's own Lower/Trim builtins). */
  def shingles3(text: Column): Column =
    GraftColumnBridge.column(
      WordShingles(GraftColumnBridge.expression(lower(trim(text)))))
}
