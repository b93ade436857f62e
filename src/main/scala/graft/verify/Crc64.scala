package graft.verify

/** CRC-64 in the ECMA-182 reflected variant (poly 0xC96C5795D7870F42,
  * init/xorout 0xFFFFFFFFFFFFFFFF) — the same public algorithm the
  * reference uses for its KV checksum (Go `hash/crc64` with the ECMA
  * table; see reference `lightning/verification/checksum.go:27-93`).
  *
  * Table-driven, allocation-free; safe to call from executor threads.
  */
object Crc64 {
  private val Poly = 0xC96C5795D7870F42L

  private val table: Array[Long] = {
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var crc = i.toLong
      var j = 0
      while (j < 8) {
        crc = if ((crc & 1L) == 1L) (crc >>> 1) ^ Poly else crc >>> 1
        j += 1
      }
      t(i) = crc
      i += 1
    }
    t
  }

  /** CRC of a full byte array. */
  def checksum(bytes: Array[Byte]): Long = update(0L, bytes)

  /** Streaming update: `crc` is the running value returned by a prior
    * call (0 for a fresh stream). Init/final inversion handled here so
    * chaining `update` calls over concatenated chunks is equivalent to
    * one call over the concatenation.
    */
  def update(crc: Long, bytes: Array[Byte]): Long = {
    var c = ~crc
    var i = 0
    val n = bytes.length
    while (i < n) {
      c = table(((c ^ bytes(i).toLong) & 0xFF).toInt) ^ (c >>> 8)
      i += 1
    }
    ~c
  }
}
