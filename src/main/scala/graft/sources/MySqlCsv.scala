package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.schema.TableSchema
import graft.transform.RowTransform

/** MySQL-flavor CSV dialect (reference `tidb-lightning.toml` `[mydumper.csv]`
  * block; parser `lightning/mydump/csv_parser.go:38-583`).
  */
case class CsvDialect(
    separator: String = ",",
    delimiter: String = "\"",
    header: Boolean = false,
    notNull: Boolean = false,
    nullValue: String = "\\N",
    backslashEscape: Boolean = true,
    trimLastSep: Boolean = false,
    encoding: String = "UTF-8",
    // quoted fields may contain raw newlines — the reference's
    // NON-strict contract (`strict-format=false` exists precisely
    // because such files cannot be byte-split; `tests/csv` escapes.CSV
    // embeds them). Costs intra-file split parallelism, so the import
    // pipeline enables it only when strictFormat is off.
    multiline: Boolean = false)

/** CSV scan, MySQL `LOAD DATA` semantics (SURVEY S6).
  *
  * Fast path: Spark's native CSV reader (vectorized, splittable at
  * newline boundaries exactly like the reference's 256 MiB region
  * split, `lightning/mydump/region.go:324-394`) covers single-char
  * separators. Multi-char separators — which Spark's `sep` cannot do —
  * fall back to a `TextInputFormat` + custom tokenizer path that stays
  * fully distributed (per-line map, no shuffle).
  *
  * All columns are read as strings (late typing, SURVEY §1.2: the CSV
  * parser emits only strings or NULL) and then cast via
  * [[RowTransform.applySchema]].
  */
object MySqlCsv {

  def read(
      spark: SparkSession,
      paths: Seq[String],
      schema: TableSchema,
      dialect: CsvDialect = CsvDialect()): DataFrame = {
    val raw = readRaw(spark, paths, schema.colNames, dialect)
    RowTransform.applySchema(raw, schema)
  }

  /** Charsets Spark 4's native CSV reader accepts; anything else
    * (GB18030 etc.) decodes through the JVM-charset tokenizer path.
    */
  def sparkReaderSupports(encoding: String): Boolean =
    Set("ISO-8859-1", "US-ASCII", "UTF-16", "UTF-16BE", "UTF-16LE", "UTF-32", "UTF-8")
      .contains(encoding.toUpperCase(java.util.Locale.ROOT))

  /** Native CSV reader options for a dialect — the single source of
    * truth shared by the batch reader and the streaming ingest, so
    * both parse a file identically. Notes: an empty delimiter maps to
    * the \u0000 quote sentinel; `notNull` maps the null sentinel to an
    * impossible value; with backslash escapes OFF, MySQL still
    * collapses a doubled delimiter inside a quoted field (reference
    * `tests/issue_519`), which univocity expresses as escape == quote.
    */
  def readerOptions(dialect: CsvDialect): Map[String, String] = Map(
    "sep" -> dialect.separator,
    "encoding" -> dialect.encoding,
    "quote" -> (if (dialect.delimiter.isEmpty) "\u0000" else dialect.delimiter),
    "header" -> dialect.header.toString,
    "nullValue" -> (if (dialect.notNull) "\u0000NONE" else dialect.nullValue),
    "emptyValue" -> "",
    "mode" -> "PERMISSIVE",
    "multiLine" -> dialect.multiline.toString,
    "escape" -> (if (dialect.backslashEscape) "\\"
      else if (dialect.delimiter.nonEmpty) dialect.delimiter
      else "\u0000"))

  /** Untyped (all-string) read honoring the dialect.
    *
    * With `header=true` the column names come from the file header,
    * lowercased — the reference builds the column permutation from
    * header names the same way (`lightning/mydump/csv_parser.go:557-568`),
    * so a CSV whose columns are reordered relative to the table schema
    * still loads correctly once [[RowTransform.permute]] name-matches.
    * `colNames` is only used positionally for headerless files.
    */
  def readRaw(
      spark: SparkSession,
      paths: Seq[String],
      colNames: Seq[String],
      dialect: CsvDialect,
      forceTokenizer: Boolean = false): DataFrame = {
    // The tokenizer path also serves two dialect corners the Spark
    // reader cannot: trim-last-sep (MyDumper emits a trailing separator
    // per line, reference `csv_parser.go` `trim-last-sep`) needs
    // per-line field surgery, and Spark 4's CSV reader only accepts a
    // short charset list (GB18030 etc. decode via JVM charsets there).
    // `forceTokenizer` keeps strict-format tables on ONE parser: their
    // compressed (unsplittable) files read whole here, and must parse
    // exactly like their chunked siblings (TextInputFormat applies the
    // gzip/bzip2 codec before the per-line map either way).
    if (!forceTokenizer &&
        dialect.separator.length == 1 && !dialect.trimLastSep &&
        sparkReaderSupports(dialect.encoding)) {
      val r = spark.read.options(readerOptions(dialect))
      if (dialect.header) {
        // names from the header; inferSchema off keeps every column string
        val df = r.option("inferSchema", "false").csv(paths: _*)
        df.toDF(df.columns.map(_.trim.toLowerCase): _*)
      } else if (colNames.isEmpty) {
        // no schema, no header (the reference's `no_schema` case):
        // positional _c0.._cN names, all strings
        r.option("inferSchema", "false").csv(paths: _*)
      } else {
        val stringSchema = StructType(colNames.map(StructField(_, StringType, nullable = true)))
        r.schema(stringSchema).csv(paths: _*)
      }
    } else {
      // Multi-char separator: distributed line tokenizer. Lines arrive
      // as (byteOffset, text) via TextInputFormat, so "offset == 0"
      // marks exactly the first line of each file — the header drop is
      // per-file and exact (a data line that happens to equal the
      // header text is kept), with no driver-side first() action.
      //
      // TextInputFormat splits lines on raw 0x0A bytes, so the
      // encoding must keep 0x0A unambiguous — reject UTF-16/32 loudly
      // here (the lz4 precedent) rather than decode garbled fragments.
      // NB Spark's native reader is NOT a fallback here: probed on this
      // Spark 4, per-line CSV with encoding=UTF-16LE splits on raw
      // 0x0A too and garbles every row after the first — UTF-16/32
      // CSV import is unsupported, full stop, and saying so beats
      // silently producing mojibake on either path.
      require(CharsetReader.newlineByteSafe(dialect.encoding),
        s"charset ${dialect.encoding} cannot be line-split on this path: " +
          "0x0A is not an unambiguous line end in it (UTF-16/32 encode '\\n' " +
          "as a multi-byte unit) — re-encode the data to UTF-8 or another " +
          "byte-oriented charset")
      val sep = dialect.separator
      val quote = if (dialect.delimiter.nonEmpty) dialect.delimiter.charAt(0) else '\u0000'
      val nullV = dialect.nullValue
      val notNull = dialect.notNull
      val esc = dialect.backslashEscape
      import org.apache.hadoop.io.{LongWritable, Text}
      import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
      // MySQL charset spellings (utf8mb4, binary…) resolve through the
      // ONE alias table — the raw config value is not a JVM charset name
      val encoding = CharsetReader.jvmName(dialect.encoding)
      val withOffset = spark.sparkContext.newAPIHadoopFile(
          paths.mkString(","), classOf[TextInputFormat],
          classOf[LongWritable], classOf[Text],
          spark.sparkContext.hadoopConfiguration)
        // copy out of the reused Writable, decoding the raw bytes with
        // the dialect charset (Text.toString would force UTF-8)
        .map { case (off, line) =>
          (off.get, new String(line.getBytes, 0, line.getLength, encoding))
        }
      val names: Seq[String] =
        if (dialect.header) {
          val h = withOffset.filter(_._1 == 0L).map(_._2).take(1).headOption
            .getOrElse(throw new IllegalArgumentException(
              s"header=true but no header line found in ${paths.mkString(",")}"))
          val split = splitLine(h, sep, quote, esc)
          val cells =
            if (dialect.trimLastSep && split.length > 1 && split.last.isEmpty)
              split.dropRight(1)
            else split
          cells.map(f => stripQuotes(f, quote, esc).trim.toLowerCase).toSeq
        } else if (colNames.nonEmpty) colNames
        else {
          // no schema, no header: width from the first line, _c0.._cN
          val first = withOffset.map(_._2).take(1).headOption.getOrElse("")
          val k = splitLine(first, sep, quote, esc).length
          (0 until k).map(i => s"_c$i")
        }
      val n = names.size
      val body =
        if (dialect.header) withOffset.filter(_._1 != 0L).map(_._2)
        else withOffset.map(_._2)
      import org.apache.spark.sql.Row
      val outSchema = StructType(names.map(StructField(_, StringType, nullable = true)))
      val trimLast = dialect.trimLastSep
      val rows = body
        .filter(_.nonEmpty)
        .map(line =>
          Row(tokenizeLine(line, sep, quote, esc, trimLast, nullV, notNull, n): _*))
      spark.createDataFrame(rows, outSchema)
    }
  }

  /** Byte-range chunk read (reference `lightning/mydump/region.go`
    * strict-format CSV splitting + `ChunkCheckpoint` offsets): parse
    * ONLY the lines of `[start, start+len)` of one file, with
    * MyDumper-region alignment — a chunk starting past 0 skips its
    * first (partial) line, and every chunk reads past its end to
    * finish the last line it owns. Line ownership is by the line's
    * first byte, so consecutive chunks partition the file exactly.
    * Only valid for strict-format CSV (no newlines inside quoted
    * fields — the same precondition the reference imposes before
    * splitting). One Spark task per chunk; the task streams the byte
    * range, never buffering the file.
    *
    * Returns the same all-strings shape as [[readRaw]]. `header`
    * drops the offset-0 line (only the chunk that owns byte 0 sees
    * it); header-derived NAMES for chunked reads must come from the
    * caller (the schema), since other chunks never see the header.
    */
  def readRawChunk(
      spark: SparkSession,
      path: String,
      start: Long,
      len: Long,
      colNames: Seq[String],
      dialect: CsvDialect): DataFrame = {
    require(colNames.nonEmpty, "chunked CSV read requires schema column names")
    // same 0x0A invariant as readRaw's tokenizer branch: chunkLines
    // scans raw bytes for line ends before any decode
    require(CharsetReader.newlineByteSafe(dialect.encoding),
      s"charset ${dialect.encoding} cannot be byte-range chunked: " +
        "0x0A is not an unambiguous line end in it (UTF-16/32)")
    val sep = dialect.separator
    val quote = if (dialect.delimiter.nonEmpty) dialect.delimiter.charAt(0) else '\u0000'
    val nullV = dialect.nullValue
    val notNull = dialect.notNull
    val esc = dialect.backslashEscape
    val trimLast = dialect.trimLastSep
    val header = dialect.header
    // same alias-table normalization as readRaw's tokenizer branch:
    // the chunk gate accepts MySQL spellings (utf8mb4, binary) that
    // java.lang.String's decoder would reject at task runtime
    val encoding = CharsetReader.jvmName(dialect.encoding)
    val n = colNames.size
    val confEntries = ConfShip.entries(spark)
    val outSchema = StructType(colNames.map(StructField(_, StringType, nullable = true)))
    val rows = spark.sparkContext.parallelize(Seq((path, start, len)), 1)
      .flatMap { case (p, s, l) =>
        val lines = chunkLines(ConfShip.rebuild(confEntries), p, s, l)
        // a task that dies mid-iteration (kill, downstream throw) must
        // not leak the open FS stream
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => lines.close()))
        lines.collect {
          case (off, bytes) if !(header && off == 0L) && bytes.nonEmpty =>
            org.apache.spark.sql.Row(tokenizeLine(new String(bytes, encoding),
              sep, quote, esc, trimLast, nullV, notNull, n): _*)
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** One line → n padded field values, the SINGLE tokenizer-path parse
    * recipe shared by [[readRaw]]'s TextInputFormat branch and
    * [[readRawChunk]] — any dialect fix lands in both or neither.
    */
  private def tokenizeLine(line: String, sep: String, quote: Char, esc: Boolean,
      trimLast: Boolean, nullV: String, notNull: Boolean, n: Int): Seq[String] = {
    val split = splitLine(line, sep, quote, esc)
    val fields =
      if (trimLast && split.length > 1 && split.last.isEmpty) split.dropRight(1)
      else split
    fields.padTo(n, null).take(n).map { f =>
      if (!notNull && f == nullV) null
      else if (f == null) null
      else stripQuotes(f, quote, esc)
    }.toSeq
  }

  /** Stream the newline-aligned lines owned by `[start, start+len)`:
    * (lineStartOffset, lineBytes) with `\n` consumed and a trailing
    * `\r` stripped. Byte-level `\n` scanning is charset-safe for
    * UTF-8 and GB18030 (neither uses 0x0A as a trailing byte).
    */
  /** Closable line iterator over one byte range; `close()` is
    * idempotent and also called on normal exhaustion.
    */
  private[sources] final class ChunkLineIterator(
      in: java.io.InputStream, startPos: Long, end: Long, fileLen: Long)
      extends Iterator[(Long, Array[Byte])] {
    private var pos = startPos
    private var nextLine: (Long, Array[Byte]) = _
    private var done = false
    def close(): Unit = if (!done) { done = true; in.close() }
    private[sources] def skipPartialFirstLine(): Unit = {
      var b = in.read()
      if (b >= 0) pos += 1
      while (b >= 0 && b != '\n') { b = in.read(); if (b >= 0) pos += 1 }
    }
    private def fetch(): Unit = {
      if (pos >= end || pos >= fileLen) { close(); return }
      val lineStart = pos
      val buf = new java.io.ByteArrayOutputStream(256)
      var b = in.read()
      while (b >= 0 && b != '\n') { pos += 1; buf.write(b); b = in.read() }
      if (b == '\n') pos += 1
      if (buf.size() == 0 && b < 0) { close(); return }
      val bytes = buf.toByteArray
      val trimmed =
        if (bytes.nonEmpty && bytes.last == '\r') bytes.dropRight(1) else bytes
      nextLine = (lineStart, trimmed)
    }
    override def hasNext: Boolean = {
      if (nextLine == null && !done) fetch()
      nextLine != null
    }
    override def next(): (Long, Array[Byte]) = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextLine; nextLine = null; r
    }
  }

  private[sources] def chunkLines(
      conf: org.apache.hadoop.conf.Configuration,
      path: String,
      start: Long,
      len: Long): ChunkLineIterator = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val fileLen = fs.getFileStatus(p).getLen
    // a chunk starting mid-file hands its partial first line to the
    // previous chunk (which reads past its own end to finish it). The
    // skip starts at start-1 — Hadoop LineRecordReader's trick — so a
    // chunk whose start lands EXACTLY on a line start consumes only
    // the previous line's '\n' and keeps the line it owns.
    val seekPos = math.min(if (start > 0L) start - 1 else 0L, fileLen)
    val in = new java.io.BufferedInputStream(
      { val s = fs.open(p); s.seek(seekPos); s }, 1 << 16)
    val it = new ChunkLineIterator(in, seekPos, start + len, fileLen)
    if (start > 0L) it.skipPartialFirstLine()
    it
  }

  /** Split one line on a (possibly multi-char) separator, honoring
    * quotes. Zero-copy: fields keep their quotes and escape pairs
    * verbatim (stripQuotes handles them later), so the scan only finds
    * boundaries and slices — no per-char buffer in the per-row hot
    * loop the tokenizer and chunk readers share.
    */
  def splitLine(
      line: String, sep: String, quote: Char, backslashEscape: Boolean): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var segStart = 0
    var i = 0
    var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (backslashEscape && c == '\\' && i + 1 < line.length) i += 2
        else if (c == quote) {
          if (i + 1 < line.length && line.charAt(i + 1) == quote) i += 2
          else { inQ = false; i += 1 }
        } else i += 1
      } else if (c == quote && quote != '\u0000') {
        inQ = true; i += 1
      } else if (line.startsWith(sep, i)) {
        out += line.substring(segStart, i); i += sep.length; segStart = i
      } else i += 1
    }
    out += line.substring(segStart)
    out.toArray
  }

  def stripQuotes(f: String, quote: Char, esc: Boolean): String = {
    if (f.length >= 2 && quote != '\u0000' && f.charAt(0) == quote && f.last == quote)
      SqlLiterals.unescape(f.substring(1, f.length - 1), quote)
    else if (esc) SqlLiterals.unescape(f, quote)
    else f
  }

  /** Sink-side CSV formatter for fixtures/round-trips: renders a
    * DataFrame to MySQL-dialect CSV text files (\N nulls, backslash
    * escapes) without collecting to the driver. With `header=true` the
    * column names are prepended to every output file (one header per
    * file, like MyDumper).
    */
  def writeRaw(df: DataFrame, path: String, dialect: CsvDialect = CsvDialect()): Unit = {
    val sep = dialect.separator
    val quote = dialect.delimiter
    val nullV = dialect.nullValue
    val cols = df.columns
    val withHeader = dialect.header
    import df.sparkSession.implicits._
    val qc = if (quote.nonEmpty) quote.charAt(0) else '"'
    def esc(s: String): String = {
      val sb = new StringBuilder(s.length + 8)
      s.foreach {
        case '\\' => sb ++= "\\\\"
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case c if c == qc => sb += '\\'; sb += c
        case c => sb += c
      }
      sb.toString
    }
    val rendered = df.map { row =>
      cols.indices.map { i =>
        val v = row.get(i)
        if (v == null) nullV
        else v match {
          case s: String => quote + esc(s) + quote
          case ts: java.sql.Timestamp => quote + ts.toInstant.toString + quote
          case other => other.toString
        }
      }.mkString(sep)
    }(org.apache.spark.sql.Encoders.STRING)
    val out =
      if (withHeader) {
        val headerLine = cols.mkString(sep)
        rendered.mapPartitions(it => Iterator(headerLine) ++ it)(
          org.apache.spark.sql.Encoders.STRING)
      } else rendered
    out.write.mode("overwrite").text(path)
  }
}
