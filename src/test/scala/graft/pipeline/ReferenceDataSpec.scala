package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Full imports over MORE of the reference's own test corpora, with
  * the exact values its run.sh scripts check: tool_135 (1000-row dump
  * aggregates), too_many_columns (a 256-column CSV row), tool_241
  * (schema-only tables restore EMPTY; the one populated table's id
  * range).
  */
class ReferenceDataSpec extends SparkSpec {

  private def imp(name: String): String = {
    val src = Paths.get(s"/root/reference/tests/$name/data")
    assume(Files.exists(src), "reference tests not present")
    val out = Files.createTempDirectory(s"graft_$name").toString
    val reports = Ingest.run(spark, Ingest.Config(src.toString, out))
    assert(reports.forall(_.checksumOk),
      s"checksums: ${reports.map(r => r.table -> r.checksumOk)}")
    out
  }

  test("tool_135: dump aggregates match the reference's pins") {
    val out = imp("tool_135")
    // run.sh pins bar1 exactly: count 1000, sum 601500, min 102,
    // max 1101; the other shards carry their own 1000-row series
    val r = spark.read.parquet(s"$out/tool_135.bar1")
      .agg(count(col("a")), sum(col("a")), min(col("a")), max(col("a")))
      .collect()(0)
    assert(r.getLong(0) === 1000L)
    assert(r.getAs[Number](1).longValue === 601500L)
    assert(r.getAs[Number](2).longValue === 102L)
    assert(r.getAs[Number](3).longValue === 1101L)
    Seq("bar2", "bar3", "bar4", "bar5").foreach { t =>
      assert(spark.read.parquet(s"$out/tool_135.$t").count() === 1000L, t)
    }
  }

  test("too_many_columns: a 256-column CSV row survives the permutation") {
    // the reference's config.toml reads this corpus with header=true
    val src = Paths.get("/root/reference/tests/too_many_columns/data")
    assume(Files.exists(src), "reference tests not present")
    val outDir = Files.createTempDirectory("graft_toomany").toString
    val rep = Ingest.run(spark, Ingest.Config(src.toString, outDir,
      csvDialect = graft.sources.CsvDialect(header = true)))
    assert(rep.forall(_.checksumOk))
    val out = outDir
    val df = spark.read.parquet(s"$out/too_many_columns.t")
    // 256 declared columns + the _tidb_rowid handle (the table has no
    // integer primary key)
    assert(df.columns.length === 257)
    val row = df.collect()(0)
    // run.sh: COL001=1001, COL100=1100, COL256=1256
    assert(row.getAs[String]("COL001") === "1001")
    assert(row.getAs[String]("COL100") === "1100")
    assert(row.getAs[String]("COL256") === "1256")
  }

  test("auto_random_default: absent AUTO_RANDOM pk synthesizes distinct ids") {
    val out = imp("auto_random_default")
    val df = spark.read.parquet(s"$out/auto_random.t")
    // run.sh: 6 rows; ids distinct with positive low-58-bit payloads
    // (the reference pins its allocator's exact low bits — 1..3 and
    // 25..27 — which are allocation-strategy-specific; the INVARIANTS
    // are what both engines must share)
    val rows = df.collect()
    assert(rows.length === 6)
    val ids = rows.map(_.getAs[Number]("id").longValue)
    assert(ids.distinct.length === 6, s"ids must be distinct: ${ids.toSeq}")
    val low = ids.map(_ & ((1L << 58) - 1))
    assert(low.forall(_ > 0L), s"low bits positive: ${low.toSeq}")
    assert(low.distinct.length === 6)
    assert(rows.map(_.getAs[String]("s")).sorted.toSeq ===
      Seq("", "", "", "test1", "test2", "test3"))
  }

  test("alter_random: explicit AUTO_RANDOM ids carry through verbatim") {
    val out = imp("alter_random")
    val ids = spark.read.parquet(s"$out/alter_random.t").collect()
      .map(_.getAs[Number]("id").longValue).sorted
    // run.sh pins the low-58-bit payloads 1, 2, 3 on the dump's
    // explicit shard-prefixed values
    assert(ids.toSeq === Seq(5764607523034234881L, 7493989779944505347L,
      8646911284551352322L))
    assert(ids.map(_ & ((1L << 58) - 1)).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("parquet corpus: dumpling layout routes via the config's file rules") {
    // tests/parquet: a dumpling-style tree (test/test.<table>/part-*.
    // gz.parquet) routed ENTIRELY by the reference config's
    // [[mydumper.files]] pattern; parquet shards carry their own
    // schema (the reference pre-creates tables and runs no-schema —
    // here the native parquet types stand in)
    val base = Paths.get("/root/reference/tests/parquet")
    assume(Files.exists(base), "reference tests not present")
    val outDir = Files.createTempDirectory("graft_refpq").toString
    val toml = Files.readString(base.resolve("config.toml"))
      .replace("no-schema=true", "no-schema=false") +
      s"\ndata-source-dir = '${base.resolve("data")}'\n" +
      "[tikv-importer]\nsorted-kv-dir = '" + outDir + "'\n"
    val loaded = TomlConfig.load(toml)
    assert(loaded.config.fileRules.size === 1)
    val reports = Ingest.run(spark, loaded.config)
    assert(reports.forall(_.checksumOk))
    // run.sh row-count pins
    val counts = Map("customer" -> 20L, "district" -> 10L,
      "history" -> 100L, "item" -> 100L, "new_order" -> 100L,
      "order_line" -> 100L, "orders" -> 100L, "stock" -> 50L,
      "warehouse" -> 1L)
    counts.foreach { case (t, n) =>
      assert(spark.read.parquet(s"$outDir/test.$t").count() === n, t)
    }
    // run.sh value pins
    val c = spark.read.parquet(s"$outDir/test.customer")
    assert(c.agg(sum(col("c_id"))).collect()(0)
      .getAs[Number](0).longValue === 210L)
    val w = spark.read.parquet(s"$outDir/test.warehouse").collect()(0)
    assert(w.getAs[String]("w_name") === "eLNEDIW")
  }

  test("no_schema: schema-only dirs import nothing; target schema wins") {
    val base = Paths.get("/root/reference/tests/no_schema")
    assume(Files.exists(base), "reference tests not present")
    // leg 1 (run.sh): --no-schema over a dir holding ONLY schema
    // files creates nothing
    val out1 = Files.createTempDirectory("graft_noschema1").toString
    val r1 = Ingest.run(spark, Ingest.Config(
      base.resolve("schema-data").toString, out1, noSchema = true))
    assert(r1.isEmpty, s"nothing should import: $r1")
    // leg 2: pre-created target (x int primary key) + the dump dir →
    // rows adopt the target's schema, sum(x) = 120
    val out2 = Files.createTempDirectory("graft_noschema2").toString
    import spark.implicits._
    Seq.empty[Int].toDF("x")
      .write.mode("overwrite").parquet(s"$out2/noschema.t")
    val r2 = Ingest.run(spark, Ingest.Config(
      base.resolve("data").toString, out2, noSchema = true))
    assert(r2.map(_.table) === Seq("t") && r2.head.checksumOk)
    val sum = spark.read.parquet(s"$out2/noschema.t")
      .agg(org.apache.spark.sql.functions.sum(col("x"))).collect()(0)
    assert(sum.getAs[Number](0).longValue === 120L)
  }

  test("examples corpus: 10k-row tables, crc32 pins, case-folding torture") {
    // the reference's oldest corpus (lightning/mydump/examples), with
    // run.sh's runtime rename to the Turkish dotless ı — the table
    // whose name and whose `ſ` column break any ToUpper-based index
    // logic (the fixture's own comment)
    val data = Paths.get("/root/reference/lightning/mydump/examples")
    assume(Files.exists(data), "reference examples not present")
    val root = Files.createTempDirectory("graft_examples")
    val src = root.resolve("src"); Files.createDirectories(src)
    Files.list(data).forEach { p =>
      val name = p.getFileName.toString.replace("mocker_test.i-schema",
        "mocker_test.ı-schema").replace("mocker_test.i.sql", "mocker_test.ı.sql")
      Files.copy(p, src.resolve(name))
    }
    val out = root.resolve("out").toString
    val reports = Ingest.run(spark, Ingest.Config(src.toString, out))
    assert(reports.forall(_.checksumOk))
    val auto = spark.read.parquet(s"$out/mocker_test.tbl_autoid")
    val a = auto.agg(countDistinct(col("ID")), sum(col("ID")),
      sum(crc32(col("Name").cast("binary")))).collect()(0)
    assert(a.getLong(0) === 10000L)
    assert(a.getAs[Number](1).longValue === 50005000L)
    assert(a.getAs[Number](2).longValue === 21388950023608L)
    val multi = spark.read.parquet(s"$out/mocker_test.tbl_multi_index")
    val m = multi.agg(countDistinct(col("Name")),
      sum(crc32(col("Name").cast("binary")))).collect()(0)
    assert(m.getLong(0) === 10000L)
    assert(m.getAs[Number](1).longValue === 21433704622808L)
    val dotless = spark.read.parquet(s"$out/mocker_test.ı").collect()
    assert(dotless.length === 1)
    assert(dotless(0).getAs[String]("ſ") === "🤪")
    val risk = spark.read.parquet(s"$out/mocker_test.report_case_high_risk")
      .collect()
    assert(risk.length === 1)
    assert(risk(0).getAs[Number]("id").longValue === 2L)
  }

  test("tool_1420: non-lowercase schema/table/column names import intact") {
    // run.sh:16-17 — `SELECT ROLE_ID FROM EE1420.pt_role` pins
    // 'ROLE_ID: 1'. The corpus is THE mixed-case regression fixture:
    // an uppercase database (EE1420), an uppercase column (ROLE_ID),
    // and an INSERT with an explicit backtick-quoted column list —
    // the case-insensitive permutation path end-to-end, with the
    // original casing preserved in the output.
    val out = imp("tool_1420")
    val df = spark.read.parquet(s"$out/EE1420.pt_role")
    assert(df.columns.contains("ROLE_ID"), df.columns.toSeq.toString)
    assert(df.collect().map(_.getAs[String]("ROLE_ID")).toSeq === Seq("1"))
  }

  test("column_permutation: its own config + header CSV permute onto the schema") {
    // The fixture's CSV header lists a SUBSET of the schema's columns
    // in its own order (no id/batch_date/crt_time), its config.toml
    // sets ONLY strict-format=true + max-region-size=200 (200-byte
    // chunking with a header, over a file with no trailing newline),
    // and the header default comes from the reference's config default
    // (header=true, config.go:385). run.sh pins count(*)=5 and the
    // contract_no='…597' row's three values.
    val base = Paths.get("/root/reference/tests/column_permutation")
    assume(Files.exists(base), "reference tests not present")
    val out = Files.createTempDirectory("graft_colperm").toString
    val toml = Files.readString(base.resolve("config.toml")).replace("[mydumper]",
      s"[mydumper]\ndata-source-dir = '${base.resolve("data")}'")
    val cfg0 = TomlConfig.load(toml, targetDirOverride = Some(out)).config
    assert(cfg0.strictFormat && cfg0.chunkBytes === 200L && cfg0.csvDialect.header)
    // the reference's DEFAULT sql-mode is non-strict
    // ("ONLY_FULL_GROUP_BY,NO_AUTO_CREATE_USER", config.go:368), so
    // ITS import fills the absent NOT NULL id with MySQL's implicit 0;
    // the library's absent-sql-mode default is the honest-NULL policy,
    // so the faithful replay opts into the lenient kernel explicitly
    val cfg = cfg0.copy(lenientCasts = true)
    val reports = Ingest.run(spark, cfg)
    assert(reports.map(r => (r.table, r.nRows, r.checksumOk)) ===
      Seq(("test_perm", 5L, true)))
    val df = spark.read.parquet(s"$out/perm.test_perm")
    assert(df.count() === 5L)
    val row = df.where(col("contract_no") === "2020061000019011020164030597")
      .collect() match {
      case Array(r) => r
      case o => fail(s"expected 1 row, got ${o.length}")
    }
    assert(row.getAs[String]("fund_seq_no")
      === "202006100001901102016403059520200627")
    assert(row.getAs[String]("region_code") === "000002")
    assert(row.getAs[String]("credit_code") === "33")
    // columns absent from the CSV exist with their defaults: the
    // NOT NULL id fills its implicit 0, crt_time its task timestamp
    assert(df.where(col("id") === 0).count() === 5L)
    assert(df.where(col("crt_time").isNull).count() === 0L)
  }

  test("row-format-v2: count and the sparse col14 domain pin") {
    // The row-format itself is a TiKV KV-encoding concern (SURVEY
    // scopes it out); the corpus' DATA leg pins are engine-neutral:
    // count(1)=50, DISTINCT col14 = {NULL, 39} over a 256-column dump
    val out = imp("row-format-v2")
    val df = spark.read.parquet(s"$out/rowformatv2.t1")
    assert(df.count() === 50L)
    val col14 = df.select("col14").distinct().collect()
      .map(r => if (r.isNullAt(0)) null else r.getAs[Number](0).intValue)
    assert(col14.toSet === Set(null, 39))
  }

  test("tool_241: schema-only tables restore empty; populated ids pin") {
    val out = imp("tool_241")
    // the five dataless tables exist with zero rows (reference
    // run.sh checks count(*): 0 for each)
    Seq("q_alarm_receiver", "q_config", "q_report_circular_data",
      "q_report_desc", "q_report_summary").foreach { t =>
      assert(spark.read.parquet(s"$out/qyjc.$t").count() === 0L,
        s"$t must restore empty")
    }
    val fish = spark.read.parquet(s"$out/qyjc.q_fish_event")
      .agg(count(col("id")), min(col("id")), max(col("id"))).collect()(0)
    assert(fish.getLong(0) === 84L)
    assert(fish.getAs[Number](1).longValue === 8343146L)
    assert(fish.getAs[Number](2).longValue === 8343229L)
  }
}
