package graft.verify

import org.scalatest.funsuite.AnyFunSuite

class Crc64Spec extends AnyFunSuite {

  private def bytes(s: String) = s.getBytes("UTF-8")

  test("matches the published CRC-64/XZ check value") {
    // standard check string for CRC-64/XZ (ECMA poly, reflected):
    assert(Crc64.checksum(bytes("123456789")) === 0x995DC9BBDF1939FAL)
  }

  test("empty input") {
    assert(Crc64.checksum(Array.emptyByteArray) === 0L)
  }

  test("streaming update equals one-shot") {
    val all = bytes("hello graft checksum world")
    val (a, b) = all.splitAt(7)
    assert(Crc64.update(Crc64.checksum(a), b) === Crc64.checksum(all))
  }

  test("distinct inputs produce distinct checksums") {
    assert(Crc64.checksum(bytes("a")) !== Crc64.checksum(bytes("b")))
  }
}
