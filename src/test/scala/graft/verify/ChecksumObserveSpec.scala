package graft.verify

import java.nio.file.Files

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sink.SortedParquetSink

/** Empirical proof that the single-pass observed checksum is correct.
  *
  * The hazard (verified here): `repartitionByRange` runs a
  * RangePartitioner sampling job that executes the plan BELOW the
  * exchange a second time, so a metric observed below the shuffle
  * accumulates twice (counts double; the XOR checksum cancels to 0).
  * `SortedParquetSink.writeObserved` attaches the observation ABOVE
  * the exchange, where rows flow exactly once.
  */
class ChecksumObserveSpec extends SparkSpec {

  test("observed metric below a range shuffle double-counts (the hazard)") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val obs = Observation()
    val out = Files.createTempDirectory("graft-obs-hazard").toString
    df.observe(obs, count(lit(1)).as("n"))
      .repartitionByRange(4, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode("overwrite").parquet(out)
    val n = obs.get("n").asInstanceOf[Long]
    // Document the hazard: the sampling pass re-executes the observed
    // plan, so n > 1000. If a future Spark version fixes this, the
    // below-shuffle placement becomes safe and this assert will flag it.
    assert(n >= 1000L, s"observed count $n")
    assert(n === 2000L, s"expected the known double-count, got $n")
  }

  test("writeObserved checksum equals the two-pass table checksum") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"name$i", i * 1.5)).toDF("id", "n", "v")
    val expected = {
      val r = Checksum.tableChecksum(df).collect()(0)
      KvChecksum(r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val obs = Observation()
    val out = Files.createTempDirectory("graft-obs-write").toString
    SortedParquetSink.writeObserved(df, out, Seq("id"), obs, Checksum.checksumCol)
    val observed = Checksum.fromMetric(obs.get("kv_checksum"))
    assert(observed === expected)
    assert(observed.totalKvs === 1000L)
    assert(observed.checksum !== 0L)
    // and the written output verifies end-to-end
    val post = {
      val r = Checksum.tableChecksum(spark.read.parquet(out)).collect()(0)
      KvChecksum(r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(Checksum.matches(observed, post))
  }
}
