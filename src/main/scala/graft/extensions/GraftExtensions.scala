package graft.extensions

import graft.functions.{CosineSimilarity, DotProduct, NfcNormalize}
import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point (SURVEY §4 / prompt preference (c)):
  * registers the native vector expressions as SQL functions, so
  * `spark.sql.extensions=graft.extensions.GraftExtensions` makes
  * `SELECT cosine_similarity(a, b)` and `dot_product(a, b)` available to
  * pure-SQL users with full codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def binary(name: String, make: (Expression, Expression) => Expression)
      : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name,
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      { children: Seq[Expression] =>
        require(children.length == 2, s"$name expects 2 arguments")
        make(children(0), children(1))
      })

  private def unary(name: String, make: Expression => Expression)
      : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name,
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      { children: Seq[Expression] =>
        require(children.length == 1, s"$name expects 1 argument")
        make(children(0))
      })

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    binary("cosine_similarity", CosineSimilarity.apply),
    binary("dot_product", DotProduct.apply),
    unary("nfc_normalize", NfcNormalize.apply))

  /** Runtime registration on an already-built session (tests, REPLs).
    * Idempotent: re-registering an existing name is skipped — callers
    * (e.g. the u02 query) may run many times per session, and each
    * replace re-invalidates the registry lookup and spams WARNs. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      if (!spark.sessionState.functionRegistry
            .functionExists(FunctionIdentifier(name)))
        GraftColumnBridge.registerFunction(spark, name, builder)
    }
}
