package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Partitioned-table targets (`tests/partitioned-table` analog): a
  * `PARTITION BY` clause in the DDL must drive a partitioned output
  * directory layout whose reads prune at the file listing, with the
  * checksum verification still green across the layout round-trip.
  */
class PartitionedIngestSpec extends SparkSpec {

  private def mkFixture(ddlTail: String): String = {
    val root = Files.createTempDirectory("graft_part_spec").toString
    Files.writeString(Paths.get(root, "d.t-schema.sql"),
      "CREATE TABLE t (id int NOT NULL, grp int, v varchar(10), " +
        s"PRIMARY KEY (id)) $ddlTail;")
    Files.writeString(Paths.get(root, "d.t.0001.csv"),
      (1 to 20).map(i => s"$i,${i % 3},\"v$i\"").mkString("", "\n", "\n"))
    root
  }

  test("PARTITION BY hash(col) lands one directory per key value, checksum-verified") {
    val src = mkFixture("partition by hash(grp) partitions 4")
    val out = Files.createTempDirectory("graft_part_out").toString
    val r = Ingest.run(spark, Ingest.Config(src, out)).head
    assert(r.nRows === 20 && r.checksumOk, r)
    val dirs = Files.list(Paths.get(s"$out/d.t")).iterator()
    val partDirs = Iterator.continually(dirs).takeWhile(_.hasNext).map(_.next())
      .map(_.getFileName.toString).filter(_.startsWith("grp=")).toSeq
    assert(partDirs.sorted === Seq("grp=0", "grp=1", "grp=2"))
    // all rows and values survive the layout round-trip
    val back = spark.read.parquet(s"$out/d.t")
    assert(back.count() === 20)
    assert(back.filter(col("grp") === 1).count() === 7)
  }

  test("a partition-key filter prunes at the file listing") {
    val src = mkFixture("partition by hash(grp) partitions 4")
    val out = Files.createTempDirectory("graft_part_out2").toString
    Ingest.run(spark, Ingest.Config(src, out))
    val df = spark.read.parquet(s"$out/d.t").filter(col("grp") === 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("grp"), plan)
    // the scan's selected partitions exclude the other keys: count the
    // files actually read via the scan's input metric
    df.collect()
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles").map(_.value).getOrElse(-1L)
    val totalFiles = Files.walk(Paths.get(s"$out/d.t")).iterator()
    val all = Iterator.continually(totalFiles).takeWhile(_.hasNext).map(_.next())
      .count(p => p.toString.endsWith(".parquet"))
    assert(scanned > 0 && scanned < all, s"scanned=$scanned of $all files")
  }

  test("tests/partitioned-table replays on its own fixture with run.sh's pins") {
    // The reference corpus itself (not a synthetic analog): a KEY
    // (non-PK) table under `partition by hash(a) partitions 5`
    // (`data/partitioned.a-schema.sql:1`), pins from run.sh:29-31 —
    // count(1)=8, sum(a)=277151781 — plus its SHOW TABLE STATUS
    // 'Create_options: partitioned' check, which here means the
    // output layout really is partitioned.
    val src = Paths.get("/root/reference/tests/partitioned-table/data")
    assume(Files.exists(src), "reference tests not present")
    val out = Files.createTempDirectory("graft_part_ref").toString
    val reports = Ingest.run(spark, Ingest.Config(src.toString, out))
    assert(reports.map(_.table) === Seq("a"))
    assert(reports.head.nRows === 8 && reports.head.checksumOk, reports.head)
    val df = spark.read.parquet(s"$out/partitioned.a")
    val agg = df.agg(
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.sum(col("a"))).collect()(0)
    assert(agg.getLong(0) === 8L)
    assert(agg.getAs[Number](1).longValue === 277151781L)
    // 'Create_options: partitioned' — the layout carries the partition
    // key directories (one per distinct a; hash(a)%5 bucket COUNT is a
    // TiKV region concern with no Spark analog, the value-partitioned
    // layout is the pruning-equivalent here)
    val dirs = Files.list(Paths.get(s"$out/partitioned.a")).iterator()
    val partDirs = Iterator.continually(dirs).takeWhile(_.hasNext).map(_.next())
      .map(_.getFileName.toString).filter(_.startsWith("a=")).toSeq
    assert(partDirs.sorted === Seq(0, 1, 4, 32, 65536, 262144, 8388608,
      268435456).map(v => s"a=$v").sorted, partDirs.toString)
    // the secondary KEY column's values survive (b carries the torture
    // strings, incl. the numeric-looking '999' on a=0)
    assert(df.where(col("a") === 0).collect().map(_.getAs[String]("b")).toSeq
      === Seq("999"))
    assert(df.where(col("a") === 268435456).collect()
      .map(_.getAs[String]("b")).toSeq === Seq("268435456"))
  }

  test("expression partitioning (no plain column list) is ignored, import stays green") {
    val src = mkFixture("") // no partition clause
    val srcExpr = Files.createTempDirectory("graft_part_spec_e").toString
    Files.writeString(Paths.get(srcExpr, "d.t-schema.sql"),
      "CREATE TABLE t (id int NOT NULL, d datetime, PRIMARY KEY (id)) " +
        "partition by range (YEAR(d)) (partition p0 values less than (2000));")
    Files.writeString(Paths.get(srcExpr, "d.t.0001.csv"),
      "1,\"1999-01-01 00:00:00\"\n2,\"2001-05-05 12:00:00\"\n")
    for (dir <- Seq(src, srcExpr)) {
      val out = Files.createTempDirectory("graft_part_out3").toString
      val r = Ingest.run(spark, Ingest.Config(dir, out)).head
      assert(r.checksumOk, r)
      // flat layout: no key=value directories
      val entries = Files.list(Paths.get(s"$out/d.t")).iterator()
      val sub = Iterator.continually(entries).takeWhile(_.hasNext).map(_.next())
        .map(_.getFileName.toString).toSeq
      assert(!sub.exists(_.contains("=")), sub.toString)
    }
  }
}
