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
  case class MediaMeta(doc_id: Long, n_bytes: Long, head: String, width: Long, height: Long)

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
          val head = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
            .take(8)
          MediaMeta(m.doc_id, m.payload.length.toLong, head, w, h)
        }
      }
  }

  /** Query: documents → binary payloads → stub decode → typed metadata. */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    extractMeta(packBinary(table(spark, sfDir, "documents")))
      .toDF().orderBy("doc_id")

  def mediaMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |  left(text, 8) AS head,
      |  CAST(octet_length(CAST(text AS BLOB)) % 640 AS BIGINT) AS width,
      |  CAST((octet_length(CAST(text AS BLOB)) * 7) % 480 AS BIGINT) AS height
      |FROM documents ORDER BY doc_id""".stripMargin
}
