package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.SparkSession

import graft.schema.TableSchema
import graft.sources.CsvDialect
import graft.transform.{GeneratedColumns, RowTransform}

/** Continuous import — the reference's server mode (`lightning/
  * lightning.go:196-214`, a task queue that repeatedly runs the import
  * over newly arriving dumps) re-expressed as Structured Streaming:
  * a landing directory of CSV shards for one table streams through the
  * SAME permute/cast/generated-columns transform as the batch path and
  * appends to the table's output.
  *
  * Exactly-once comes from the two Spark logs the reference builds by
  * hand as checkpoint machinery (`lightning/checkpoints/checkpoints.go`):
  * the file-source checkpoint records which source files are ingested
  * (file-level resume), and the parquet sink's `_spark_metadata` commit
  * log makes partially-written batches invisible to readers (crash =
  * re-run of an uncommitted batch, never a duplicate append).
  *
  * `Trigger.AvailableNow` drains everything currently in the directory
  * and stops — the one-shot run over a growing dump dir; the default
  * micro-batch trigger is the always-on server mode. Scale: the file
  * source lists incrementally (`maxFilesPerTrigger` bounds a batch) and
  * the transform is the same narrow codegen'd projection as batch
  * ingest, so a 1000-executor cluster ingests each micro-batch exactly
  * like one batch import.
  */
object StreamingIngest {

  /** Start the stream. Caller owns awaitTermination/stop.
    *
    * @param availableNow true = drain-and-stop (one-shot catch-up);
    *   false = stay live, micro-batching as files land.
    * @param maxFilesPerTrigger bound on files per micro-batch — the
    *   admission control knob (reference `io-concurrency`/task queue).
    */
  def run(
      spark: SparkSession,
      landingDir: String,
      schema: TableSchema,
      outDir: String,
      checkpointDir: String,
      dialect: CsvDialect = CsvDialect(),
      availableNow: Boolean = true,
      maxFilesPerTrigger: Int = 1000): StreamingQuery = {
    require(dialect.separator.length == 1,
      "streaming ingest uses the native CSV source (single-char separator)")
    val rawSchema = StructType(
      schema.colNames.map(StructField(_, StringType, nullable = true)))
    var reader = spark.readStream
      .schema(rawSchema)
      .option("sep", dialect.separator)
      .option("quote", if (dialect.delimiter.isEmpty) "\u0000" else dialect.delimiter)
      .option("header", dialect.header.toString)
      .option("nullValue", if (dialect.notNull) "\u0000NONE" else dialect.nullValue)
      .option("emptyValue", "")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
    reader = if (dialect.backslashEscape) reader.option("escape", "\\")
      else if (dialect.delimiter.nonEmpty) reader.option("escape", dialect.delimiter)
      else reader.option("escape", "\u0000")
    val raw = reader.csv(landingDir)
    val typed = GeneratedColumns(RowTransform.applySchema(raw, schema), schema)
    val writer = typed.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
