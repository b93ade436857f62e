package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The reference's `tests/checkpoint_columns` analog: the data files
  * list columns in a DIFFERENT order than the table schema
  * (`INSERT INTO tbl (j, i) VALUES …`), the import crashes after the
  * first delivery, and the resume must keep the same column
  * permutation — run.sh pins one row landed mid-crash and `j=4 where
  * i=2` after the resume (a permutation drift would land j in i).
  * The corpus builds its data inline in run.sh; mirrored here with the
  * two rows split across shards so a batch boundary exists to crash on.
  */
class CheckpointColumnsSpec extends SparkSpec {

  test("column permutation survives a mid-table crash-resume") {
    val dir = Files.createTempDirectory("graft_cptsr")
    Files.writeString(dir.resolve("cp_tsr-schema-create.sql"),
      "CREATE DATABASE cp_tsr;")
    Files.writeString(dir.resolve("cp_tsr.tbl-schema.sql"),
      "CREATE TABLE tbl(i TINYINT PRIMARY KEY, j INT);")
    Files.writeString(dir.resolve("cp_tsr.tbl.0001.sql"),
      "INSERT INTO tbl (j, i) VALUES (3, 1);")
    Files.writeString(dir.resolve("cp_tsr.tbl.0002.sql"),
      "INSERT INTO tbl (j, i) VALUES (4, 2);")
    val out = Files.createTempDirectory("graft_cptsr_out").toString
    val state = Files.createTempDirectory("graft_cptsr_state").toString
    val cfg = Ingest.Config(dir.toString, out, stateDir = Some(state),
      strictFormat = true, chunkBytes = 4096L, chunkBatch = 1,
      failpointAfterBatches = Some(1))
    val e = intercept[IllegalStateException] { Ingest.run(spark, cfg) }
    assert(e.getMessage.contains("failpoint"))
    // run.sh: one row written before the crash
    assert(spark.read.parquet(s"$out/cp_tsr.tbl").count() === 1L)
    val rep = Ingest.run(spark, cfg.copy(failpointAfterBatches = None))
    assert(rep.forall(_.checksumOk))
    val rows = spark.read.parquet(s"$out/cp_tsr.tbl").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    // run.sh pin: j=4 where i=2 (and the crashed row's mapping held)
    assert(rows === Map(1 -> 3, 2 -> 4))
  }
}
