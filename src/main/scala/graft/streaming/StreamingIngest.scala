package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.SparkSession

import graft.schema.TableSchema
import graft.sources.{CsvDialect, MySqlCsv}
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
      maxFilesPerTrigger: Int = 1000,
      // the same target-session variables the batch path threads
      // (Ingest.Config.sessionVars): generated-column bytes must not
      // depend on which path imported the file
      sessionVars: GeneratedColumns.SessionVars =
        GeneratedColumns.SessionVars()): StreamingQuery = {
    require(dialect.separator.length == 1,
      "streaming ingest uses the native CSV source (single-char separator)")
    require(!dialect.trimLastSep,
      "trim-last-sep needs the tokenizer path; not supported for streaming")
    require(MySqlCsv.sparkReaderSupports(dialect.encoding),
      s"charset ${dialect.encoding} needs the tokenizer path; not supported for streaming")
    // A streaming source needs its schema up front. With header=true
    // the column ORDER comes from the landing files' header (peeked
    // from one file; consistent across files by contract — the batch
    // path builds a per-file permutation, a stream cannot), so a
    // reordered-vs-schema header still loads correctly once
    // applySchema name-matches. Headerless files use schema order.
    val rawNames =
      if (dialect.header) peekHeader(spark, landingDir, dialect).getOrElse(schema.colNames)
      else schema.colNames
    val rawSchema = StructType(
      rawNames.map(StructField(_, StringType, nullable = true)))
    val raw = spark.readStream
      .schema(rawSchema)
      .options(MySqlCsv.readerOptions(dialect)) // same parse as batch
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .csv(landingDir)
    val typed = GeneratedColumns(
      RowTransform.applySchema(raw, schema), schema, sessionVars)
    val writer = typed.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Header names (lowercased) from the first line of one landing
    * file, None when the directory has no data file yet. Driver-side,
    * once per stream start.
    */
  private[streaming] def peekHeader(
      spark: SparkSession,
      landingDir: String,
      dialect: CsvDialect): Option[Seq[String]] = {
    val fs = new org.apache.hadoop.fs.Path(landingDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(landingDir)
    if (!fs.exists(dir)) return None
    // same exclusions as Spark's file stream listing: '_'- and
    // '.'-prefixed files are metadata/hidden (e.g. LocalFileSystem's
    // .crc siblings), never data
    val files = fs.listStatus(dir).toSeq
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
    files.headOption.map { f =>
      val in = fs.open(f.getPath)
      try {
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, dialect.encoding))
        val line = Option(br.readLine()).getOrElse("")
        val quote = if (dialect.delimiter.nonEmpty) dialect.delimiter.charAt(0) else '\u0000'
        MySqlCsv.splitLine(line, dialect.separator, quote, dialect.backslashEscape)
          .map(c => MySqlCsv.stripQuotes(c, quote, dialect.backslashEscape).trim.toLowerCase)
          .toSeq
      } finally in.close()
    }
  }
}
