package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec

/** wavMeta parses actual RIFF/WAVE bytes — assembled independently
  * with ByteBuffer little-endian puts, not the fixture builder — so a
  * header from any real encoder resolves the same way.
  */
class WavMetaSpec extends SparkSpec {

  /** A canonical 44-byte PCM WAV header + `dataLen` sample bytes. */
  private def wav(channels: Int, rate: Int, bits: Int, dataLen: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    val byteRate = rate * channels * (bits / 8)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate).putInt(byteRate)
      .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
      .put(Array.fill[Byte](dataLen)(0x42))
    bb.array()
  }

  test("parses real WAV headers and rejects non-RIFF bytes") {
    import spark.implicits._
    val df = Seq(
      (1L, wav(channels = 2, rate = 44100, bits = 16, dataLen = 88200)),
      (2L, wav(channels = 1, rate = 8000, bits = 8, dataLen = 4000)),
      (3L, "certainly not audio".getBytes("UTF-8")),
      (4L, "RIFFxxxxAVI LIST".getBytes("US-ASCII"))) // RIFF but not WAVE
      .toDF("doc_id", "payload")
    val out = Multimodal.wavMeta(df).orderBy("doc_id").collect()
    // stereo 44.1 kHz 16-bit, half a second of samples
    assert(out(0).getAs[Boolean]("is_wav"))
    assert(out(0).getAs[Long]("n_channels") === 2L)
    assert(out(0).getAs[Long]("sample_rate") === 44100L)
    assert(out(0).getAs[Long]("bits_per_sample") === 16L)
    assert(out(0).getAs[Long]("data_bytes") === 88200L)
    assert(out(0).getAs[Long]("duration_ms") === 500L)
    // mono 8 kHz 8-bit, exactly half a second
    assert(out(1).getAs[Long]("duration_ms") === 500L)
    assert(out(1).getAs[Long]("bits_per_sample") === 8L)
    // non-audio payloads flag false and stay null, never garbage
    Seq(2, 3).foreach { i =>
      assert(!out(i).getAs[Boolean]("is_wav"))
      assert(out(i).isNullAt(out(i).fieldIndex("sample_rate")))
      assert(out(i).isNullAt(out(i).fieldIndex("duration_ms")))
    }
  }

  test("fixture payloads parse back to the oracle's arithmetic") {
    val out = Multimodal.mediaWav(spark, sf()).limit(50).collect()
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(1))
      assert(r.getLong(2) === id % 2 + 1, s"channels of $id")
      assert(r.getLong(3) === Seq(8000L, 16000L, 44100L)((id % 3).toInt),
        s"rate of $id")
    }
  }
}
