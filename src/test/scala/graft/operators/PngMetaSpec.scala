package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** pngMeta parses actual PNG bytes — not the fixture builder — so a
  * header from any real encoder resolves the same way.
  */
class PngMetaSpec extends SparkSpec {

  // a complete, valid 1x1 transparent PNG (hand-assembled: signature,
  // IHDR 1x1 depth-8 RGBA, IDAT with one zlib-stored scanline, IEND)
  private val onePixelPng: Array[Byte] = {
    def be(i: Int) = Array[Byte](
      (i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte)
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    val ihdrBody = be(1) ++ be(1) ++ Array[Byte](8, 6, 0, 0, 0)
    val crc = new java.util.zip.CRC32()
    def chunk(tag: String, body: Array[Byte]) = {
      crc.reset()
      crc.update(tag.getBytes("US-ASCII"))
      crc.update(body)
      be(body.length) ++ tag.getBytes("US-ASCII") ++ body ++ be(crc.getValue.toInt)
    }
    val raw = Array[Byte](0, 0, 0, 0, 0) // filter byte + RGBA(0,0,0,0)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](64)
    val n = deflater.deflate(buf)
    sig ++ chunk("IHDR", ihdrBody) ++ chunk("IDAT", buf.take(n)) ++
      chunk("IEND", Array.empty[Byte])
  }

  test("parses a complete real PNG and rejects non-PNG bytes") {
    import spark.implicits._
    val df = Seq(
      (1L, onePixelPng),
      (2L, "not a png at all".getBytes("UTF-8")),
      (3L, Array[Byte](0x89.toByte, 'P'))) // truncated before the signature ends
      .toDF("doc_id", "payload")
    val out = Multimodal.pngMeta(df).orderBy("doc_id")
      .select("doc_id", "is_png", "width", "height").collect()
    assert(out(0).getBoolean(1) && out(0).getLong(2) === 1L && out(0).getLong(3) === 1L)
    assert(!out(1).getBoolean(1) && out(1).isNullAt(2))
    assert(!out(2).getBoolean(1) && out(2).isNullAt(2))
  }

  test("big dimensions survive the hex round trip") {
    import spark.implicits._
    def be(i: Int) = Array[Byte](
      (i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte)
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    val hdr = sig ++ be(13) ++ "IHDR".getBytes("US-ASCII") ++
      be(65535) ++ be(1 << 20) ++ Array[Byte](8, 6, 0, 0, 0)
    val out = Multimodal.pngMeta(Seq((1L, hdr)).toDF("doc_id", "payload"))
      .select("width", "height").collect()(0)
    assert(out.getLong(0) === 65535L)
    assert(out.getLong(1) === (1L << 20))
  }
}
