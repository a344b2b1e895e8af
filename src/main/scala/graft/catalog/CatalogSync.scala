package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog registration + partition discovery (SURVEY §3.4) — the
  * reference's Glue database + nightly crawler (SDP.py:581-616) collapsed
  * to Spark's own catalog.
  *
  * `register` creates an external Parquet table over a path;
  * `sync` re-discovers partitions (`MSCK REPAIR TABLE` semantics via
  * `recoverPartitions`) — the "crawler run". Schema comes from the Parquet
  * footers (self-describing), i.e. the crawler's inference step is the
  * format's own metadata.
  */
object CatalogSync {

  /** Register (or replace) an external table over a Parquet path. For a
    * Hive-partitioned layout, pass the partition columns so the catalog
    * prunes on them. */
  def register(spark: SparkSession, table: String, path: String,
               partitionCols: Seq[String] = Seq("year", "month", "day", "hour")): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val schema = spark.read.parquet(path).schema
    val dataCols = schema.fields.filterNot(f => partitionCols.contains(f.name))
    val dataDdl = dataCols.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    val partDdl = schema.fields.filter(f => partitionCols.contains(f.name))
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    if (partDdl.nonEmpty) {
      spark.sql(
        s"""CREATE TABLE $table ($dataDdl) USING parquet
           |PARTITIONED BY ($partDdl) LOCATION '$path'""".stripMargin)
      sync(spark, table)
    } else {
      spark.sql(s"CREATE TABLE $table ($dataDdl) USING parquet LOCATION '$path'")
    }
  }

  /** The crawler pass: re-discover partitions added since registration. */
  def sync(spark: SparkSession, table: String): Unit =
    spark.catalog.recoverPartitions(table)

  /** Query a registered table (the Athena surface, README:155-164). */
  def query(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)
}
