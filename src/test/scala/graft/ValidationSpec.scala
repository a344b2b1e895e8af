package graft

import graft.validate.SchemaValidator
import graft.validate.SchemaValidator.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))

  test("parseJson routes malformed payloads instead of failing the batch") {
    val raw = Seq(
      """{"id": 1, "v": 2.5}""",
      """{"id": 2, "v": }""",      // malformed
      """not json at all""").toDS()
    val parsed = SchemaValidator.parseJson(raw, schema)
    val (valid, invalid) = SchemaValidator.route(parsed)
    assert(valid.count() == 1)
    assert(invalid.count() == 2)
    assert(invalid.select(SchemaValidator.ErrorsCol).as[Seq[String]]
      .collect().forall(_ == Seq("malformed_json")))
    assert(valid.select("id").as[Long].head() == 1L)
  }

  test("applyRules names each failed rule and nulls count as failures") {
    val df = Seq(
      (1L, Some(10.0)),  // passes both
      (2L, Some(-1.0)),  // fails positive
      (3L, None),        // null → fails positive (and present)
    ).toDF("id", "v")
    val rules = Seq(
      Rule("v_present", col("v").isNotNull),
      Rule("v_positive", col("v") > 0))
    val out = SchemaValidator.applyRules(df, rules)
      .select(col("id"), col(SchemaValidator.IsValidCol), col(SchemaValidator.ErrorsCol))
      .as[(Long, Boolean, Seq[String])].collect().sortBy(_._1)
    assert(out(0) == ((1L, true, Seq())))
    assert(out(1) == ((2L, false, Seq("v_positive"))))
    assert(out(2) == ((3L, false, Seq("v_present", "v_positive"))))
  }

  test("applyRules composes with parseJson errors") {
    val raw = Seq("""{"id": 1, "v": -5.0}""", """broken""").toDS()
    val out = SchemaValidator.applyRules(
      SchemaValidator.parseJson(raw, schema),
      Seq(Rule("v_positive", col("v") > 0)))
    val errs = out.select(SchemaValidator.ErrorsCol).as[Seq[String]].collect().toSet
    assert(errs == Set(Seq("v_positive"), Seq("malformed_json", "v_positive")))
  }
}
