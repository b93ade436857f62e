package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's `tests/checkpoint_parquet` analog: a PARQUET-shard
  * source (its parquet.go generates iVal 0..N-1 with s = str(i) over
  * `-chunk` files) crashes mid-import — run.sh pins a partial table
  * (32 of 100 rows) — and the rerun converges to the exactly-once
  * totals (count 100, sum(iVal) 4950). The tampered-checkpoint leg is
  * TiDB-chunk-table-specific; the token-set resume proof it targets
  * is covered by the chunk-resume specs.
  */
class CheckpointParquetSpec extends SparkSpec {

  test("parquet shards crash mid-import; rerun lands the exact totals") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_cppq")
    Files.writeString(src.resolve("cppq_tsr-schema-create.sql"),
      "CREATE DATABASE cppq_tsr;")
    Files.writeString(src.resolve("cppq_tsr.tbl-schema.sql"),
      "CREATE TABLE tbl (iVal int, s varchar(20));")
    // ten single-file shards, ten rows each — parquet.go's layout
    (0 until 10).foreach { k =>
      val tmp = Files.createTempDirectory(s"graft_cppq_shard$k")
      ((k * 10) until ((k + 1) * 10)).map(i => (i, i.toString))
        .toDF("iVal", "s").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, src.resolve(f"cppq_tsr.tbl.$k%02d.parquet"))
    }
    val out = Files.createTempDirectory("graft_cppq_out").toString
    val e = intercept[IllegalStateException] {
      Ingest.run(spark, Ingest.Config(src.toString, out,
        failpointPartialRows = Some(32)))
    }
    assert(e.getMessage.contains("failpoint"))
    // run.sh: a PARTIAL table is visible after the crash
    assert(spark.read.parquet(s"$out/cppq_tsr.tbl").count() === 32L)
    val rep = Ingest.run(spark, Ingest.Config(src.toString, out))
    assert(rep.forall(_.checksumOk))
    val r = spark.read.parquet(s"$out/cppq_tsr.tbl")
      .agg(count(lit(1)), sum(col("iVal"))).collect()(0)
    // run.sh pins: count 100, sum 0..99 = 4950
    assert((r.getLong(0), r.getLong(1)) === ((100L, 4950L)))
  }
}
