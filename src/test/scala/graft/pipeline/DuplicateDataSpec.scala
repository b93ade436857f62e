package graft.pipeline

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's `tests/tidb_duplicate_data` replayed: each
  * on-duplicate policy (replace/ignore/error) runs against a PARTIAL
  * prior import — run 1 dies after importing SOME rows (the
  * `FailIfImportedSomeRows` failpoint, run.sh:24-31), the corpus data
  * is then rewritten 'old'→'new' (run.sh's sed), and run 2 must merge
  * the re-import against what landed. Pins are the run.sh
  * check_contains values: replace → both rows 'new'; ignore → the
  * landed row keeps 'old', the missing row arrives 'new'; error →
  * the rerun fails with MySQL's `Duplicate entry` message.
  */
class DuplicateDataSpec extends SparkSpec {

  private val src = Paths.get("/root/reference/tests/tidb_duplicate_data")

  /** Copy of the corpus data dir (run.sh mutates the data between
    * runs; the reference tree is read-only) with the d column set to
    * `marker`.
    */
  private def dataDir(marker: String): String = {
    val dir = Files.createTempDirectory(s"graft_dup_$marker")
    Seq("dup-schema-create.sql", "dup.dup-schema.sql").foreach { f =>
      Files.copy(src.resolve(s"data/$f"), dir.resolve(f))
    }
    val sql = Files.readString(src.resolve("data/dup.dup.sql"))
      .replace("old", marker)
    Files.writeString(dir.resolve("dup.dup.sql"), sql)
    dir.toString
  }

  private def readDup(out: String): Map[Int, String] =
    spark.read.parquet(s"$out/dup.dup").collect()
      .map(r => r.getAs[Int]("pk") -> r.getAs[String]("d")).toMap

  /** Run 1: import 'old' data, failpoint after 1 row → partial table
    * (pk=1 'old' only), no state recorded. Returns the target dir.
    */
  private def partialImport(policy: String): String = {
    assume(Files.exists(src), "reference tests not present")
    val out = Files.createTempDirectory(s"graft_dup_out_$policy").toString
    val e = intercept[IllegalStateException] {
      Ingest.run(spark, Ingest.Config(dataDir("old"), out,
        onDuplicate = Some(policy), failpointPartialRows = Some(1)))
    }
    assert(e.getMessage.contains("failpoint"))
    val partial = readDup(out)
    assert(partial.size === 1, s"one row landed before the crash: $partial")
    out
  }

  test("replace: rerun wins on every collided key (count 2, both 'new')") {
    val out = partialImport("replace")
    val reports = Ingest.run(spark, Ingest.Config(dataDir("new"), out,
      onDuplicate = Some("replace")))
    assert(reports.head.checksumOk)
    assert(readDup(out) === Map(1 -> "new", 2 -> "new"))
  }

  test("ignore: landed row keeps 'old', missing row arrives 'new'") {
    val out = partialImport("ignore")
    val reports = Ingest.run(spark, Ingest.Config(dataDir("new"), out,
      onDuplicate = Some("ignore")))
    assert(reports.head.checksumOk)
    val rows = readDup(out)
    assert(rows.size === 2)
    // the failpoint imported exactly one row; whichever pk it was
    // keeps 'old' under ignore, the other arrives 'new'
    assert(rows.values.toSeq.sorted === Seq("new", "old"))
  }

  test("error: rerun fails with MySQL's Duplicate entry message") {
    val out = partialImport("error")
    val e = intercept[Exception] {
      Ingest.run(spark, Ingest.Config(dataDir("new"), out,
        onDuplicate = Some("error")))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("Duplicate entry")), msgs(e).mkString("\n"))
    // the partial row is still there, untouched by the failed rerun
    assert(readDup(out).size === 1)
  }

  test("merge rebases synthesized handles past the existing table") {
    // a varchar-pk table needs _tidb_rowid; the partial prior import
    // synthesized 1..N — the policy rerun must fill the incoming rows
    // ABOVE them, never re-issue the same handles into the union
    val dir = Files.createTempDirectory("graft_dup_rowid")
    Files.writeString(dir.resolve("d-schema-create.sql"), "CREATE DATABASE d;")
    Files.writeString(dir.resolve("d.t-schema.sql"),
      "create table t (pk varchar(4) primary key, v varchar(8));")
    Files.writeString(dir.resolve("d.t.sql"),
      "insert into t values ('a', 'old'), ('b', 'old'), ('c', 'old');")
    val out = Files.createTempDirectory("graft_dup_rowid_out").toString
    val e = intercept[IllegalStateException] {
      Ingest.run(spark, Ingest.Config(dir.toString, out,
        onDuplicate = Some("ignore"), failpointPartialRows = Some(2)))
    }
    assert(e.getMessage.contains("failpoint"))
    val rerun = Ingest.run(spark, Ingest.Config(dir.toString, out,
      onDuplicate = Some("ignore")))
    assert(rerun.head.checksumOk)
    val rows = spark.read.parquet(s"$out/d.t").collect()
      .map(r => r.getAs[String]("pk") -> r.getAs[Number]("_tidb_rowid").longValue)
    assert(rows.length === 3)
    val handles = rows.map(_._2).toSeq
    assert(handles.distinct.size === handles.size,
      s"duplicate _tidb_rowid handles after the merge: ${rows.toSeq}")
  }

  test("the corpus tomls parse: backend=tidb + on-duplicate map through") {
    assume(Files.exists(src), "reference tests not present")
    Seq("replace", "ignore", "error").foreach { p =>
      val text = Files.readString(src.resolve(s"$p.toml")) +
        s"""
           |sorted-kv-dir = '/tmp/x'
           |[mydumper]
           |data-source-dir = '/tmp/y'
           |""".stripMargin
      val l = TomlConfig.load(text)
      // replace.toml carries no on-duplicate key: backend=tidb alone
      // defaults the policy to "replace", like the reference's config
      assert(l.config.onDuplicate === Some(p), p)
    }
  }
}
