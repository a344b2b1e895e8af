package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class VectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("native dot matches manual computation and HOF reference") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -1.0f, 2.0f), Array(1.0f, 1.0f, 1.0f))).toDF("a", "b")
    val native = df.select(VectorFunctions.dot(col("a"), col("b"))).as[Double].collect()
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)).as[Double].collect()
    assert(native.toSeq == hof.toSeq)
    assert(native(0) == 32.0 && native(1) == 1.5)
  }

  test("native dot supports mixed float/double arrays (literal planes)") {
    val df = Seq(Array(1.0f, 2.0f)).toDF("v")
    val out = df.select(VectorFunctions.dot(col("v"), lit(Array(3.0, 4.0)))).as[Double].head()
    assert(out == 11.0)
  }

  test("native cosine: exact value, null propagation, zero-norm null") {
    val df = Seq(
      (Some(Array(1.0f, 0.0f)), Some(Array(1.0f, 0.0f))),   // cos = 1
      (Some(Array(1.0f, 0.0f)), Some(Array(0.0f, 1.0f))),   // cos = 0
      (Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 0.0f))),   // zero norm → null
      (None, Some(Array(1.0f, 0.0f)))).toDF("a", "b")       // null input → null
    val out = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Option[Double]].collect()
    assert(out(0).contains(1.0))
    assert(out(1).contains(0.0))
    assert(out(2).isEmpty && out(3).isEmpty)
  }

  test("cosine participates in whole-stage codegen") {
    val df = spark.range(100).select(
      array(col("id").cast("float"), lit(2.0f)).as("a"),
      array(lit(3.0f), col("id").cast("float")).as("b"))
    val q = df.select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
    // `*(n)` prefixes mark operators fused into a WholeStageCodegen stage
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("), plan)
    assert(q.count() == 100)
  }

  test("interpreted eval path (no codegen) agrees with codegen path") {
    val df = Seq((Array(1.5f, -2.5f, 3.0f), Array(0.5f, 4.0f, -1.0f))).toDF("a", "b")
    val gen = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].head()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].head()
      assert(interp == gen)
    }
  }

  private def withSQLConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
