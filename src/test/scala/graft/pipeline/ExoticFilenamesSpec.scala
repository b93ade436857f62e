package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's `tests/exotic_filenames` replayed with its exact
  * runtime file names: backticks and double quotes in db/table/file
  * names, doubled-backtick escapes in DDL and INSERT identifiers,
  * unicode names, plus explicit `_tidb_rowid` + auto-inc through the
  * same tables.
  */
class ExoticFilenamesSpec extends SparkSpec {

  test("exotic db/table/file names import end to end") {
    val data = Paths.get("/root/reference/tests/exotic_filenames/data")
    assume(Files.exists(data), "reference tests not present")
    val root = Files.createTempDirectory("graft_exotic")
    val src = root.resolve("src"); Files.createDirectories(src)
    // the exact renames the reference's run.sh performs
    val renames = Seq(
      "zwk-schema-create.sql" -> "中文庫-schema-create.sql",
      "zwk.zwb-schema.sql" -> "中文庫.中文表-schema.sql",
      "zwk.zwb.sql" -> "中文庫.中文表.sql",
      "xfn-schema-create.sql" -> "x`f\"n-schema-create.sql",
      "xfn.etn-schema.sql" -> "x`f\"n.exotic`table``name-schema.sql",
      "xfn.etn.sql" -> "x`f\"n.exotic`table``name.sql")
    renames.foreach { case (from, to) =>
      Files.copy(data.resolve(from), src.resolve(to),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val out = root.resolve("out").toString
    val reports = Ingest.run(spark, Ingest.Config(src.toString, out))
    assert(reports.forall(_.checksumOk),
      s"checksums: ${reports.map(r => (r.db, r.table, r.checksumOk))}")
    assert(reports.map(r => (r.db, r.table)).toSet === Set(
      ("中文庫", "中文表"), ("x`f\"n", "exotic`table``name")))

    // run.sh: SELECT * FROM 中文庫.中文表 → a: 2345
    val zw = spark.read.parquet(s"$out/中文庫.中文表").collect()
    assert(zw.map(_.getInt(0)).toSeq === Seq(2345))

    // run.sh: count(*) = 5; the dump supplies b and _tidb_rowid
    // explicitly through the escaped-identifier INSERTs
    val ex = spark.read.parquet(s"$out/x`f\"n.exotic`table``name")
    assert(ex.count() === 5L)
    val r = ex.agg(min(col("b")), max(col("b")),
      min(col("_tidb_rowid")), max(col("_tidb_rowid"))).collect()(0)
    assert(r.getAs[Number](0).longValue === 11L)
    assert(r.getAs[Number](1).longValue === 55L)
    assert(r.getAs[Number](2).longValue === 79995L)
    assert(r.getAs[Number](3).longValue === 79999L)
  }
}
