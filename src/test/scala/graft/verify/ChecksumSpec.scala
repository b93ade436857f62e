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

  test("empty table checksums to the zero triple") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    val r = Checksum.tableChecksum(empty).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((0L, 0L, 0L)))
  }

  test("the checksum aggregate map-side combines and codegens") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val cs = Checksum.tableChecksum(df)
    cs.collect() // finalize the adaptive plan
    val plan = cs.queryExecution.executedPlan.toString
    // partial_bit_xor over the codegen'd crc64 = map-side combine of
    // the checksum before any exchange
    assert(plan.contains("partial_bit_xor(crc64("), plan)
    // "*(n)" prefixes mark WholeStageCodegen stages in the compact plan
    assert(plan.contains("*(1)"), plan)
  }

  test("KvChecksum.add is the XOR/sum merge") {
    val x = KvChecksum(0x0F0FL, 2, 10).add(KvChecksum(0xF0F0L, 3, 20))
    assert(x === KvChecksum(0xFFFFL, 5, 30))
  }
}
