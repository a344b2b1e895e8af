package graft.streaming

import graft.validate.SchemaValidator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The ingestion-transport seam (SURVEY §2.1 S1-S5). The reference
  * consumes from multiple transports — S3 drop directory, Kinesis
  * stream, SQS queue (SDP.py:161-174, :634-655) — while everything
  * downstream (validation, partition derivation, sinks, replays) only
  * ever sees an unbounded DataFrame. This trait names that seam so a
  * deployment can swap the transport (a Kafka/Kinesis connector on a
  * real cluster; the file queue in this sandbox) without touching the
  * pipeline composition: `processingStream(source.read(spark), rules)`
  * is the whole contract.
  *
  * Two implementations prove source-agnosticism where no network broker
  * exists: the production-shaped [[JsonFileSource]] and the synthetic
  * [[RateEventSource]] (StreamingSpec runs the same
  * validate→derive→partitioned-sink pipeline over both).
  */
trait StreamSource {
  /** An unbounded (streaming) DataFrame; schema is transport-specific,
    * but must carry the event-time column the pipeline partitions on. */
  def read(spark: SparkSession): DataFrame
}

/** S1/S3: JSON files landing in a directory (the S3 `incoming/` feed) —
  * delegates to [[StreamingPipeline.jsonFileSource]], which documents
  * the PERMISSIVE corrupt-record contract and the batch-size/LATEST
  * option mapping. */
final case class JsonFileSource(
    dir: String,
    schema: StructType,
    maxFilesPerTrigger: Int = 100,
    latestFirst: Boolean = false,
    options: Map[String, String] = Map.empty) extends StreamSource {
  override def read(spark: SparkSession): DataFrame =
    StreamingPipeline.jsonFileSource(
      spark, dir, schema, maxFilesPerTrigger, latestFirst, options)
}

/** Synthetic event feed over Spark's built-in rate source — the
  * stand-in for a broker-backed transport in environments without one
  * (smoke tests, load probes). Maps the rate source's monotone
  * (timestamp, value) rows onto the event shape deterministically:
  * `id` = the rate counter, `value` = a fixed mix of signs so routing
  * rules split the feed non-trivially. Parse-level corruption cannot
  * exist on this transport, so there is no `_corrupt_record` — exactly
  * like a binary broker payload that deserializes by construction. */
final case class RateEventSource(
    rowsPerSecond: Int = 100,
    numPartitions: Int = 1) extends StreamSource {
  override def read(spark: SparkSession): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toLong)
      .option("numPartitions", numPartitions.toLong)
      .load()
      .select(
        col("value").as("id"),
        col("timestamp").as("ts"),
        // ~1 in 5 rows negative: gives validation rules a real split
        (when(col("value") % 5 === 0, lit(-1.0)).otherwise(lit(1.0)) *
          (col("value") % 100).cast("double")).as("value"))
}

/** A network push transport behind the seam: newline-delimited JSON
  * events over a TCP socket (Spark's built-in `socket` source + a
  * `from_json` parse). This is the sandbox stand-in for the reference's
  * Kinesis consumer (SDP.py:161-174, :648-655) with the property file
  * feeds cannot exercise: the transport itself can deliver records out
  * of ORDER (and a real broker can drop/redeliver), so correctness must
  * come from the event-time watermark, not arrival order — StreamingSpec
  * drives a deliberately reordered feed through it and asserts the
  * watermark keeps within-bound stragglers and drops too-late rows.
  *
  * Parse failures surface under [[StreamSources.CorruptCol]] exactly like
  * the file transport (a broker payload is bytes; malformed is data, not
  * an exception), so [[StreamingPipeline.processingStream]] composes
  * unchanged. The socket source keeps no replayable offsets — a real
  * deployment swaps in a Kafka/Kinesis connector for exactly-once; this
  * implementation is the transport-semantics testbed, not the durability
  * story. */
final case class SocketJsonSource(
    host: String,
    port: Int,
    schema: StructType,
    options: Map[String, String] = Map.empty) extends StreamSource {
  override def read(spark: SparkSession): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(SchemaValidator.CorruptCol)) schema
      else schema.add(SchemaValidator.CorruptCol, "string")
    spark.readStream
      .format("socket")
      .option("host", host)
      .option("port", port.toLong)
      .load()
      .select(from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> SchemaValidator.CorruptCol) ++ options).as("r"),
        col("value").as("__raw"))
      // from_json yields a NULL struct (not a corrupt-record row) for
      // unparseable payloads — restate those as corrupt rows carrying the
      // raw line so the quarantine contract matches the file transport
      .select((0 until withCorrupt.length).map { i =>
        val f = withCorrupt(i)
        if (f.name == SchemaValidator.CorruptCol)
          when(col("r").isNull, col("__raw"))
            .otherwise(col(s"r.${f.name}")).as(f.name)
        else col(s"r.${f.name}").as(f.name)
      }: _*)
  }
}

object StreamSources {
  /** The event-feed schema both test transports agree on; downstream
    * code never depends on it (it reads whatever `read` yields), it is
    * here so specs state the contract once. */
  val EventSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))

  /** Corrupt-record column name re-exported for transport implementors:
    * a parsing transport (files, text payloads) must surface malformed
    * input under this column for [[StreamingPipeline.processingStream]]
    * to route it to quarantine. */
  val CorruptCol: String = SchemaValidator.CorruptCol
}
