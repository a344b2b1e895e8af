package graft

class SparkEntrySpec extends SparkSpec {

  test("entry (flagship q03) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs and returns rows on sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with empty result: $empty")
  }

  test("all test tables load, including nanos-timestamped events") {
    Tables.names.foreach { t =>
      assert(Tables.load(spark, sf, t).columns.nonEmpty, t)
    }
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    assert(ev.count() > 0)
  }
}
