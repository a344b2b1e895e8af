package graft

import graft.extensions.GraftExtensions
import graft.functions.Aggregators
import graft.sink.Sinks
import org.apache.spark.sql.functions._

import java.nio.file.Files

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL functions register and run with full codegen") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f)), (Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val out = spark.sql(
      "SELECT round(cosine_similarity(a, b), 6) AS c, dot_product(a, b) AS d FROM vecs")
      .as[(Double, Double)].collect().toSet
    assert(out == Set((1.0, 1.0), (0.0, 0.0)))
  }

  test("extensions class injects the same functions into a fresh session") {
    // the config path a production deployment uses
    val ext = new GraftExtensions()
    assert(GraftExtensions.functions.map(_._1).toSet ==
      Set("cosine_similarity", "dot_product", "nfc_normalize"))
    // apply() must be callable without error on a fresh extensions object
    ext.apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("PassRate aggregator: typed grouped usage with map-side combine") {
    val ds = Seq(("a", true), ("a", true), ("a", false), ("b", true)).toDS()
    val rates = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(Aggregators.PassRate.toColumn.name("rate"))
      .collect().toMap
    assert(math.abs(rates("a") - 2.0 / 3) < 1e-12 && rates("b") == 1.0)
  }

  test("VarianceStats: Welford merge matches two-pass variance") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 10.0)
    val (n, mean, variance) = xs.toDS().repartition(3)
      .select(Aggregators.VarianceStats.toColumn).head()
    val m = xs.sum / xs.size
    val v = xs.map(x => (x - m) * (x - m)).sum / xs.size
    assert(n == 5 && math.abs(mean - m) < 1e-12 && math.abs(variance - v) < 1e-9)
  }

  test("bucketed tables join with zero shuffle and zero sort") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = Tables.orders(spark, sf)
      val l = Tables.lineitem(spark, sf)
      Sinks.writeBucketed(o, "b_orders", "o_orderkey", 8)
      Sinks.writeBucketed(l.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8)
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == l.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
