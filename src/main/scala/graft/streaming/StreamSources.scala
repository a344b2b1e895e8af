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
      .transform(df => StreamSources.parseJsonPayload(df, withCorrupt, options))
  }
}

/** S3 over a Kafka topic: the real broker-backed transport behind the
  * seam — the reference's Kinesis consumer (SDP.py:648-655) mapped onto
  * the `kafka` data source option-for-option:
  *
  *  - `start at LATEST` (SDP.py:654)  → `startingOffsets = "latest"`
  *    (new query begins at the log head; a RESTARTED query always
  *    resumes from its checkpointed offsets — same as Kinesis LATEST
  *    with a saved iterator);
  *  - consumer batch size 100 (:652)  → `maxOffsetsPerTrigger` caps
  *    records per micro-batch (a rate knob: Kafka's analog of the
  *    GetRecords limit);
  *  - redelivery tolerance (:133-136) → `failOnDataLoss = false`
  *    surfaces expired/compacted offsets as gaps rather than query
  *    death, matching the at-least-once posture.
  *
  * The record VALUE is a JSON payload: parsed through the same
  * corrupt-record contract as the file and socket transports
  * ([[StreamSources.parseJsonPayload]]), so
  * `processingStream(source.read(spark), rules)` composes unchanged and
  * malformed broker payloads quarantine as data instead of killing the
  * batch.
  *
  * Compile-time complete with no Kafka classes (the data source
  * resolves BY NAME at query start); RUNNING it needs the
  * `spark-sql-kafka-0-10` connector on the cluster classpath, which
  * this sandbox does not ship — StreamingSpec therefore drives the
  * option mapping and the payload parse on an embedded fake (a batch
  * frame standing in for the broker's value column), the two pieces
  * that are this class's actual logic. */
final case class KafkaJsonSource(
    bootstrapServers: String,
    topic: String,
    schema: StructType,
    startingOffsets: String = "latest",
    maxOffsetsPerTrigger: Long = 100L,
    options: Map[String, String] = Map.empty) extends StreamSource {

  /** The reader options handed to the kafka source — factored out so
    * the spec pins the reference-semantics mapping without a broker. */
  def readerOptions: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets,
    "maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString,
    "failOnDataLoss" -> "false") ++ options

  override def read(spark: SparkSession): DataFrame =
    KafkaJsonSource.parse(
      spark.readStream.format("kafka").options(readerOptions).load(),
      schema)
}

object KafkaJsonSource {
  /** Kafka wire frame → event rows: value bytes as JSON through the
    * shared corrupt-record parse. Factored from `read` so the spec can
    * drive it with a fake frame carrying the connector's exact output
    * schema (key/value binary, topic, partition, offset, timestamp). */
  def parse(wire: DataFrame, schema: StructType): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(SchemaValidator.CorruptCol)) schema
      else schema.add(SchemaValidator.CorruptCol, "string")
    StreamSources.parseJsonPayload(
      wire.select(col("value").cast("string").as("value")),
      withCorrupt, Map.empty)
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

  /** The JSON-payload parse shared by every text-payload transport
    * (socket lines, Kafka value bytes), over an input with a string
    * `value` column: `from_json` yields a NULL struct (not a
    * corrupt-record row) for unparseable payloads, so those are
    * restated as corrupt rows carrying the raw payload — the same
    * quarantine contract as the file transport. Two-step select so
    * from_json evaluates ONCE per row (inlining it per output field
    * would re-parse the payload N times). */
  def parseJsonPayload(df: DataFrame, withCorrupt: StructType,
                       options: Map[String, String]): DataFrame =
    df.select(from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> SchemaValidator.CorruptCol) ++ options).as("r"),
        col("value").as("__raw"))
      .select((0 until withCorrupt.length).map { i =>
        val f = withCorrupt(i)
        if (f.name == SchemaValidator.CorruptCol)
          when(col("r").isNull, col("__raw"))
            .otherwise(col(s"r.${f.name}")).as(f.name)
        else col(s"r.${f.name}").as(f.name)
      }: _*)

  /** Corrupt-record column name re-exported for transport implementors:
    * a parsing transport (files, text payloads) must surface malformed
    * input under this column for [[StreamingPipeline.processingStream]]
    * to route it to quarantine. */
  val CorruptCol: String = SchemaValidator.CorruptCol
}
