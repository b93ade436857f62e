package graft.verify

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ChecksumSpec extends SparkSpec {

  test("table checksum is partitioning- and order-independent") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"name$i", i * 1.5)).toDF("id", "n", "v")
    val a = Checksum.tableChecksum(df).collect()(0)
    val b = Checksum.tableChecksum(df.repartition(7).sortWithinPartitions(desc("n")))
      .collect()(0)
    assert(a === b)
    assert(a.getLong(1) === 500L)
  }

  test("checksum detects a single changed value") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val tampered = df.withColumn("v",
      when(col("id") === 42L, lit("v42x")).otherwise(col("v")))
    val a = Checksum.tableChecksum(df).collect()(0)
    val b = Checksum.tableChecksum(tampered).collect()(0)
    assert(a.getLong(0) !== b.getLong(0)) // checksum differs
    assert(a.getLong(1) === b.getLong(1)) // same row count
  }

  test("KvChecksum.add is the XOR/sum merge") {
    val x = KvChecksum(0x0F0FL, 2, 10).add(KvChecksum(0xF0F0L, 3, 20))
    assert(x === KvChecksum(0xFFFFL, 5, 30))
  }
}
