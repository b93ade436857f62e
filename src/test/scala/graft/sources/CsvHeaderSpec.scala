package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Header handling for both CSV paths (single-char = Spark reader,
  * multi-char = distributed tokenizer): names come from the header
  * (lowercased); only the per-file first line is dropped — a data line
  * whose text equals the header is kept (the old `filter(_ != first)`
  * approach silently lost such lines).
  */
class CsvHeaderSpec extends SparkSpec {

  private def writeFiles(lines: Seq[Seq[String]]): String = {
    val dir = Files.createTempDirectory("graft-csv-hdr")
    lines.zipWithIndex.foreach { case (ls, i) =>
      Files.write(dir.resolve(f"part-$i%04d.csv"), ls.mkString("\n").getBytes("UTF-8"))
    }
    dir.toString
  }

  test("multi-char path: header names drive the schema, look-alike data line kept") {
    val dir = writeFiles(Seq(
      Seq("ID|+|NAME", "1|+|a", "ID|+|NAME", "2|+|b"), // line 3 looks like the header
      Seq("ID|+|NAME", "3|+|c")))
    val df = MySqlCsv.readRaw(spark, Seq(dir), Nil,
      CsvDialect(separator = "|+|", header = true))
    assert(df.columns.toSeq === Seq("id", "name"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    // 5 data lines survive: only the first line of each file was dropped
    assert(rows.toSeq === Seq(("1", "a"), ("2", "b"), ("3", "c"), ("ID", "NAME")))
  }

  test("single-char path: header names lowercased, reordered columns permute by name") {
    import graft.schema.MysqlDdl
    val dir = writeFiles(Seq(Seq("B,A", "x,1", "y,2")))
    val df = MySqlCsv.readRaw(spark, Seq(dir), Nil, CsvDialect(header = true))
    assert(df.columns.toSeq === Seq("b", "a"))
    val schema = MysqlDdl.parse(
      "CREATE TABLE t (a bigint, b varchar(10), c int DEFAULT 7);")
    val typed = graft.transform.RowTransform.applySchema(df, schema)
    assert(typed.columns.toSeq === Seq("a", "b", "c"))
    val rows = typed.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(rows.toSeq === Seq((1L, "x", 7), (2L, "y", 7)))
  }

  test("trimLastSep drops the trailing separator, even with single-char sep") {
    val dir = writeFiles(Seq(Seq("1,a,", "2,,", "3,c,")))
    val df = MySqlCsv.readRaw(spark, Seq(dir), Seq("k", "v"),
      CsvDialect(trimLastSep = true))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    // middle row: "2,," trims ONE trailing sep; the remaining empty
    // field stays an empty string, not a swallowed column
    assert(rows.toSeq === Seq(("1", "a"), ("2", ""), ("3", "c")))
  }

  test("GB18030-encoded data decodes through the dialect charset") {
    val dir = Files.createTempDirectory("graft-csv-gbk")
    val line = "1,中文\n2,测试\n"
    Files.write(dir.resolve("part-0000.csv"), line.getBytes("GB18030"))
    // single-char Spark path
    val a = MySqlCsv.readRaw(spark, Seq(dir.toString), Seq("k", "v"),
      CsvDialect(encoding = "GB18030"))
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(a.toSeq === Seq(("1", "中文"), ("2", "测试")))
    // tokenizer path (multi-char sep forced via trimLastSep=false + sep len 2)
    val line2 = "1||中文\n2||测试\n"
    val dir2 = Files.createTempDirectory("graft-csv-gbk2")
    Files.write(dir2.resolve("part-0000.csv"), line2.getBytes("GB18030"))
    val b = MySqlCsv.readRaw(spark, Seq(dir2.toString), Seq("k", "v"),
      CsvDialect(separator = "||", encoding = "GB18030"))
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(b.toSeq === Seq(("1", "中文"), ("2", "测试")))
  }

  test("latin1-encoded data decodes on the native Spark reader path") {
    val dir = Files.createTempDirectory("graft-csv-latin1")
    val line = "1,café\n2,naïve\n"
    Files.write(dir.resolve("part-0000.csv"), line.getBytes("ISO-8859-1"))
    // ISO-8859-1 is in the native reader's charset set — no tokenizer
    // fallback; the bytes are NOT valid UTF-8, so a wrong-charset read
    // would corrupt the accents
    val a = MySqlCsv.readRaw(spark, Seq(dir.toString), Seq("k", "v"),
      CsvDialect(encoding = "ISO-8859-1"))
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(a.toSeq === Seq(("1", "café"), ("2", "naïve")))
  }

  test("writeRaw header=true emits a header per output file") {
    import spark.implicits._
    val df = (1 to 20).map(i => (i, s"v$i")).toDF("k", "v").repartition(3)
    val out = Files.createTempDirectory("graft-csv-whdr").toString
    MySqlCsv.writeRaw(df, out, CsvDialect(header = true))
    val back = MySqlCsv.readRaw(spark, Seq(out), Nil, CsvDialect(header = true))
    assert(back.columns.toSeq === Seq("k", "v"))
    assert(back.count() === 20L)
  }
}
