package graft

import graft.functions.ShingleFunctions
import graft.text.TextAnalysis.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-14 optimization contract: the native [[graft.functions.WordShingles]]
  * expression is byte-identical to the interpreted HOF pipeline it
  * replaces (`array_distinct ∘ filter ∘ zip_with² ∘ slice²` over
  * `split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")`) — on the
  * real corpus, the hostile corpus shape, and the adversarial edge
  * strings that exercise every branch of the span scan (leading/trailing
  * whitespace empty-token rule, empty input, all-whitespace input,
  * sub-3-token inputs, duplicate grams, non-ASCII text). The old pipeline
  * stays in the tree as this spec's reference implementation. */
class ShingleExpressionSpec extends SparkSpec {

  private def oldShingles(df: DataFrame): DataFrame = df
    .select(col("id"), tokens(col("text")).as("toks"))
    .select(col("id"), graft.dedup.Dedup.shingles(col("toks")).as("sh"))

  private def newShingles(df: DataFrame): DataFrame = df
    .select(col("id"), ShingleFunctions.shingles3(col("text")).as("sh"))

  /** Exact frame equality including ARRAY ORDER (first-occurrence
    * distinct order is part of the contract). */
  private def assertSame(df: DataFrame): Unit = {
    val old = oldShingles(df).orderBy(col("id")).collect()
    val neu = newShingles(df).orderBy(col("id")).collect()
    assert(old.length == neu.length)
    old.zip(neu).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getSeq[String](1) == b.getSeq[String](1),
        s"id=${a.getLong(0)}: ${a.getSeq[String](1)} != ${b.getSeq[String](1)}")
    }
  }

  test("native shingles ≡ HOF pipeline on the documents corpus") {
    assertSame(Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), col("text")))
  }

  test("native shingles ≡ HOF pipeline on the hostile-boilerplate shape") {
    assertSame(Tables.documents(spark, sf)
      .select(col("doc_id").as("id"),
        concat(col("text"),
          lit(" " + graft.dedup.Dedup.HostileBoilerplate)).as("text")))
  }

  test("native shingles ≡ HOF pipeline on adversarial edge strings") {
    import spark.implicits._
    val edges = Seq(
      "",                       // empty → split yields [""], no grams
      " ",                      // trim eats it → empty
      "\t",                     // survives trim → collapsed " " → ["",""]
      "\t\n\u000b\u000c\r",     // all Java-\s classes in one run
      "a", "a b",               // fewer than 3 tokens → no grams
      "a b c",                  // exactly one gram
      "a b c d",                // overlapping grams
      "a a a a a",              // duplicate grams → distinct keeps first
      "  a  b  c  ",            // runs of spaces (trim + collapse)
      "\ta b c",                // leading tab → leading empty token
      "a b c\t",                // trailing tab → trailing empty token
      "x\ty\nz\u000bw",         // mixed separators
      "A B C",                  // case folding via Spark's own lower()
      "ÄÖÜ ß Straße İstanbul",  // non-ASCII case mapping stays the engine's
      "日本 語 テキスト です",    // CJK with spaces
      "а б в г",                // Cyrillic
      "a\u00a0b c d",           // NBSP is NOT Java \s — stays inside a token
      "one two three two three four") // repeated window
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    assertSame(edges)
  }
}
