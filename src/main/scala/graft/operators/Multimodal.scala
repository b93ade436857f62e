package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.GraftSession.table

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode/feature-extraction runs as a
  * batched per-partition map (the Scala analog of a vectorized UDF —
  * rows stream through the executor in partition-sized batches, no
  * driver involvement, no shuffle).
  *
  * The actual codec is STUBBED (no image/audio libs in this
  * container): `decodeStub` derives deterministic fake dimensions from
  * the payload. The Spark-side contract — schema, binary transport,
  * batch shape, partition-parallel extraction — is real and tested;
  * swapping `decodeStub` for a JNI/OpenCV call changes nothing else.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, head: String,
      width: Long, height: Long, resized_w: Long, resized_h: Long)

  /** ??? in spirit — the deterministic fake standing in for a real
    * image decode. Keeps the pipeline testable end-to-end.
    */
  def decodeStub(payload: Array[Byte]): (Long, Long) = {
    val n = payload.length.toLong
    (n % 640, (n * 7) % 480)
  }

  /** Pack a text table into the binary-payload shape a media table has:
    * (id, payload binary, meta struct). On a real corpus this column
    * holds JPEG/PNG/WAV bytes read by a binaryFile source.
    */
  def packBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("source"), col("lang")).as("meta"))

  /** Batched metadata/feature extraction over the binary column. */
  def extractMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { batch =>
        batch.map { m =>
          val (w, h) = decodeStub(m.payload)
          val (rw, rh) = resizeStub(w, h)
          val head = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
            .take(8)
          MediaMeta(m.doc_id, m.payload.length.toLong, head, w, h, rw, rh)
        }
      }
  }

  /** Query: documents → binary payloads → stub decode → typed metadata. */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    extractMeta(packBinary(table(spark, sfDir, "documents")))
      .toDF().orderBy("doc_id")

  def mediaMetaSql: String =
    """WITH d AS (SELECT doc_id, text,
      |    CAST(octet_length(CAST(text AS BLOB)) % 640 AS BIGINT) AS width,
      |    CAST((octet_length(CAST(text AS BLOB)) * 7) % 480 AS BIGINT) AS height
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |  left(text, 8) AS head, width, height,
      |  greatest(CAST(1 AS BIGINT), width // 2) AS resized_w,
      |  greatest(CAST(1 AS BIGINT), height // 2) AS resized_h
      |FROM d ORDER BY doc_id""".stripMargin

  // -------------------------------------------- resize + frame-sample
  case class FrameRow(doc_id: Long, frame_idx: Long, frame: String)

  /** Stub standing in for a real image resize: halves the decoded
    * dimensions (floor, min 1). The real thing is a per-row pixel
    * transform with the same (binary in, binary out) shape.
    */
  def resizeStub(w: Long, h: Long): (Long, Long) =
    (math.max(1L, w / 2), math.max(1L, h / 2))

  /** Frame sampling over a video-like payload: each payload splits into
    * `n` evenly-sized frame slices, one output row per frame — a 1→n
    * flatMap inside the same partition-batched map the decode uses (no
    * shuffle; the row explosion happens executor-side). The slice is by
    * character here because the stub "codec" treats the payload as
    * text; a real codec slices at keyframe boundaries.
    */
  def frameSample(media: DataFrame, n: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { batch =>
        batch.flatMap { m =>
          val text = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
          // slice by codepoints, not UTF-16 units: Spark's length() and
          // the oracle both count codepoints, and a unit-based cut could
          // split a surrogate pair mid-character
          val cps = text.codePointCount(0, text.length)
          (0 until n).iterator.map { i =>
            val from = text.offsetByCodePoints(0, (cps.toLong * i / n).toInt)
            val until = text.offsetByCodePoints(0, (cps.toLong * (i + 1) / n).toInt)
            FrameRow(m.doc_id, i.toLong, text.substring(from, until))
          }
        }
      }
      .toDF()
  }

  /** Query: per-frame fingerprints + resized dimensions — the full
    * multimodal plumbing chain (pack → decode stub → frame-sample →
    * per-frame feature) with codegen'd hashing on top of the batched
    * map.
    */
  def mediaFrames(spark: SparkSession, sfDir: String): DataFrame = {
    val media = packBinary(table(spark, sfDir, "documents"))
    frameSample(media, 4)
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        graft.functions.TextFunctions.md5Long(col("frame")).as("frame_fp"))
      .orderBy("doc_id", "frame_idx")
  }

  // NB // (floor division): DuckDB's / yields DOUBLE and CAST rounds,
  // which would disagree with Spark's integer division at frame edges.
  def mediaFramesSql: String =
    """WITH f AS (
      |  SELECT doc_id, i AS frame_idx,
      |    substr(text, (length(text) * i // 4) + 1,
      |      (length(text) * (i + 1) // 4) - (length(text) * i // 4)) AS frame
      |  FROM documents, UNNEST(range(4)) AS r(i))
      |SELECT doc_id, frame_idx,
      |  CAST(length(frame) AS BIGINT) AS frame_len,
      |  CAST(('0x' || substr(md5(frame), 1, 14)) AS BIGINT) AS frame_fp
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  // ------------------------------------------- real-format header parse
  /** Big-endian uint32 → 4 raw bytes, as a column expression. */
  private def int32be(c: org.apache.spark.sql.Column) =
    unhex(lpad(hex(c), 8, "0"))

  /** Deterministic dimensions for the synthetic PNG fixture. */
  private def dimsOf(docId: org.apache.spark.sql.Column) =
    (pmod(docId, lit(640)) + 16, pmod(docId * 7, lit(480)) + 16)

  /** A REAL (truncated) PNG: 8-byte signature + IHDR chunk with
    * big-endian width/height + the doc text as stand-in body bytes.
    * Anything that parses PNG accepts this header — the fixture is
    * synthetic, the format is not.
    */
  private def pngPayload(docId: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column) = {
    val (w, h) = dimsOf(docId)
    concat(
      lit(Array[Byte](0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
        0x0D, 0x0A, 0x1A, 0x0A)),
      lit(Array[Byte](0, 0, 0, 13)), // IHDR length
      lit("IHDR".getBytes("US-ASCII")),
      int32be(w), int32be(h),
      lit(Array[Byte](8, 6, 0, 0, 0)), // depth 8, RGBA
      encode(text, "UTF-8"))
  }

  /** PNG metadata WITHOUT a codec: the signature check and the IHDR
    * width/height live at fixed byte offsets, so `substring` on the
    * binary column + a hex→int conversion extract them inside
    * whole-stage codegen — real-format metadata at scan speed, the
    * pattern that handles "what resolution distribution does this
    * 100 TB image corpus have" without decoding a single pixel. (The
    * pixel decode itself stays behind the documented stub.)
    */
  def pngMeta(media: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val p = col(payloadCol)
    val beLong = (from: Int) => conv(hex(substring(p, from, 4)), 16, 10).cast("long")
    media
      .withColumn("is_png",
        hex(substring(p, 1, 8)) === "89504E470D0A1A0A")
      .withColumn("width", when(col("is_png"), beLong(17)))
      .withColumn("height", when(col("is_png"), beLong(21)))
  }

  /** Query: build real PNG headers from the documents table, then
    * recover the dimensions by parsing the BYTES. The oracle computes
    * the expected dimensions arithmetically — a parser bug cannot
    * cancel out, because the two sides never share the binary path.
    */
  def mediaPng(spark: SparkSession, sfDir: String): DataFrame =
    pngMeta(table(spark, sfDir, "documents")
        .select(col("doc_id"), pngPayload(col("doc_id"), col("text")).as("payload")))
      .select(col("doc_id"), col("is_png"), col("width"), col("height"),
        length(col("payload")).cast("long").as("n_bytes"))
      .orderBy("doc_id")

  def mediaPngSql: String =
    """SELECT doc_id, TRUE AS is_png,
      |  CAST(doc_id % 640 + 16 AS BIGINT) AS width,
      |  CAST((doc_id * 7) % 480 + 16 AS BIGINT) AS height,
      |  CAST(octet_length(CAST(text AS BLOB)) + 29 AS BIGINT) AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Little-endian uint32/uint16 → raw bytes, as column expressions
    * (RIFF formats are LE where PNG is BE — byte-swap via hex-pair
    * reordering, still pure `functions._`).
    */
  private def int32le(c: org.apache.spark.sql.Column) = {
    val hx = lpad(hex(c), 8, "0")
    unhex(concat(substring(hx, 7, 2), substring(hx, 5, 2),
      substring(hx, 3, 2), substring(hx, 1, 2)))
  }
  private def int16le(c: org.apache.spark.sql.Column) = {
    val hx = lpad(hex(c), 4, "0")
    unhex(concat(substring(hx, 3, 2), substring(hx, 1, 2)))
  }

  /** Deterministic audio parameters for the synthetic WAV fixture. */
  private def wavParams(docId: org.apache.spark.sql.Column) = {
    val channels = pmod(docId, lit(2)) + 1
    val rate = when(pmod(docId, lit(3)) === 0, 8000)
      .when(pmod(docId, lit(3)) === 1, 16000)
      .otherwise(44100)
    (channels, rate)
  }

  /** A REAL canonical 44-byte PCM WAV header (RIFF + fmt + data
    * chunks, all little-endian) over the doc text as stand-in sample
    * bytes — same honesty contract as [[pngPayload]]: synthetic
    * fixture, real format.
    */
  private def wavPayload(docId: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column) = {
    val (channels, rate) = wavParams(docId)
    val bits = lit(16)
    val data = encode(text, "UTF-8")
    val dataLen = length(data)
    val byteRate = rate * channels * 2 // bits/8 = 2
    concat(
      lit("RIFF".getBytes("US-ASCII")), int32le(dataLen + 36),
      lit("WAVE".getBytes("US-ASCII")),
      lit("fmt ".getBytes("US-ASCII")), int32le(lit(16)),
      int16le(lit(1)), // PCM
      int16le(channels), int32le(rate), int32le(byteRate),
      int16le(channels * 2), // block align
      int16le(bits),
      lit("data".getBytes("US-ASCII")), int32le(dataLen),
      data)
  }

  /** WAV metadata WITHOUT a codec: RIFF/WAVE signature check plus the
    * little-endian fmt-chunk fields at their canonical offsets —
    * substring + hex-pair reordering + conv, all inside the scan, so
    * "what sample-rate/channel/duration distribution does this corpus
    * have" runs at scan speed over opaque binary columns. Duration is
    * derived from the PARSED byte-rate and data-size fields, not the
    * fixture formula.
    */
  def wavMeta(media: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val p = col(payloadCol)
    val le = (from: Int, len: Int) => conv(
      concat((len to 1 by -1).map(i => hex(substring(p, from + i - 1, 1))): _*),
      16, 10).cast("long")
    media
      .withColumn("is_wav",
        hex(substring(p, 1, 4)) === "52494646" && // "RIFF"
          hex(substring(p, 9, 4)) === "57415645") // "WAVE"
      .withColumn("n_channels", when(col("is_wav"), le(23, 2)))
      .withColumn("sample_rate", when(col("is_wav"), le(25, 4)))
      .withColumn("bits_per_sample", when(col("is_wav"), le(35, 2)))
      .withColumn("data_bytes", when(col("is_wav"), le(41, 4)))
      .withColumn("duration_ms",
        when(col("is_wav"), expr("data_bytes * 1000 div (sample_rate * n_channels * (bits_per_sample div 8))")))
  }

  /** Query: synthesize real WAV headers from the documents table and
    * recover every fmt field by parsing the BYTES; the oracle computes
    * the same fields arithmetically, so the two sides never share the
    * binary path and a parser bug cannot cancel out.
    */
  def mediaWav(spark: SparkSession, sfDir: String): DataFrame =
    wavMeta(table(spark, sfDir, "documents")
        .select(col("doc_id"), wavPayload(col("doc_id"), col("text")).as("payload")))
      .select(col("doc_id"), col("is_wav"), col("n_channels"),
        col("sample_rate"), col("bits_per_sample"), col("data_bytes"),
        col("duration_ms"))
      .orderBy("doc_id")

  def mediaWavSql: String =
    """SELECT doc_id, TRUE AS is_wav,
      |  CAST(doc_id % 2 + 1 AS BIGINT) AS n_channels,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |       ELSE 44100 END AS BIGINT) AS sample_rate,
      |  CAST(16 AS BIGINT) AS bits_per_sample,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS data_bytes,
      |  CAST(octet_length(CAST(text AS BLOB)) * 1000 //
      |    ((CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END)
      |     * (doc_id % 2 + 1) * 2) AS BIGINT) AS duration_ms
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Exact dedup over the BINARY payload — the image/audio analog of
    * text exact-dedup (byte-identical assets collapse regardless of
    * filename or metadata). One md5-groupBy with map-side combine;
    * content hashes, never payloads, reach the shuffle, so the wire
    * cost per asset is 16 bytes even when the asset is megabytes.
    */
  def mediaDedup(spark: SparkSession, sfDir: String): DataFrame =
    packBinary(table(spark, sfDir, "documents"))
      .groupBy(md5(col("payload")).as("fp"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_uniq"),
        sum(col("n")).as("n_media"),
        sum(col("n") - 1).as("n_dup_copies"))

  def mediaDedupSql: String =
    """SELECT count(*) AS n_uniq, CAST(sum(n) AS BIGINT) AS n_media,
      |  CAST(sum(n - 1) AS BIGINT) AS n_dup_copies
      |FROM (SELECT md5(text) AS fp, count(*) AS n FROM documents GROUP BY 1)""".stripMargin
}
