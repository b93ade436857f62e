package graft.operators

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession.table
import graft.discover.TableRoute
import graft.pipeline.{Ingest, TomlConfig}
import graft.schema.MysqlDdl
import graft.sink.InsertDumpWriter
import graft.sources.MySqlCsv
import graft.transform.{GeneratedColumns, RowTransform}

/** End-to-end pipeline queries: the full §3.1 import (discover → route
  * → parse → transform → sorted write → checksum verify) over a
  * generated MyDumper fixture directory, and the generated-columns
  * transform (T7).
  */
object PipelineQueries {

  private def fixRoot(sfDir: String): String =
    graft.GraftSession.fixtureRoot(sfDir)

  // ------------------------------------------------------------ quarantine
  /** Bad-row quarantine (the reference's error-report tables,
    * `lightning.max-error` family: the OFFENDING ROWS are recorded,
    * not just counted): rows failing ≥1 cast land as raw JSON beside
    * the import — still lexical, so the user fixes and re-imports
    * them. The import itself proceeds (errors within budget), the
    * quarantine holds exactly the two planted bad rows.
    */
  def quarantine(spark: SparkSession, sfDir: String): DataFrame = {
    val root = Paths.get(fixRoot(sfDir), "quarantine_src")
    val qdir = Paths.get(fixRoot(sfDir), "quarantine_bad")
    val tgt = Paths.get(fixRoot(sfDir), "quarantine_out")
    deleteRec(root); deleteRec(qdir); deleteRec(tgt)
    Files.createDirectories(root)
    Files.writeString(root.resolve("q.t-schema.sql"),
      "CREATE TABLE t (id int NOT NULL, n int, d date);")
    Files.writeString(root.resolve("q.t.0001.csv"),
      "1,10,2021-01-01\n2,notanum,2021-01-02\n3,30,notadate\n4,40,2021-01-04\n")
    val reports = Ingest.run(spark, Ingest.Config(root.toString, tgt.toString,
      quarantineDir = Some(qdir.toString)))
    require(reports.head.badRows == 2, s"expected 2 bad rows: ${reports.head}")
    spark.read.json(s"$qdir/q.t")
      .select(col("id"), col("n"), col("d"), col(RowTransform.ErrorsCol))
      .orderBy("id")
  }

  def quarantineSql: String =
    """SELECT * FROM (VALUES
      |  ('2', 'notanum', '2021-01-02', CAST(1 AS BIGINT)),
      |  ('3', '30', 'notadate', CAST(1 AS BIGINT))
      |) AS t(id, n, d, _graft_cast_errors) ORDER BY id""".stripMargin

  // ------------------------------------------------------------ export
  /** Export → re-import identity (the dumpling direction): customer
    * exports to a MyDumper dump — rendered DDL ([[MysqlDdl.render]],
    * the parser's inverse) plus distributed INSERT shards — and
    * [[Ingest.run]] restores it through the FULL pipeline (discovery,
    * dump parse, DDL casts, sorted write, checksum verify). The
    * re-imported table must equal the source exactly: doubles
    * round-trip because `Double.toString` → cast-to-double is the
    * identity, and the checksum gate inside Ingest already failed the
    * query if anything was lost.
    */
  def exportRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dump = Paths.get(fixRoot(sfDir), "export_dump")
    val tgt = Paths.get(fixRoot(sfDir), "export_reimport")
    deleteRec(dump); deleteRec(tgt)
    val src = table(spark, sfDir, "customer")
    graft.pipeline.Export.table(src, "exp", "customer", dump.toString,
      rowsPerStatement = 50, shards = 3, primaryKey = Seq("c_custkey"))
    val reports = Ingest.run(spark, Ingest.Config(dump.toString, tgt.toString))
    require(reports.forall(_.checksumOk), "export roundtrip checksum failed")
    spark.read.parquet(s"$tgt/exp.customer").orderBy("c_custkey")
  }

  def exportRoundtripSql: String =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |FROM customer ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------- forget (GDPR)
  /** Deletion propagation (right-to-be-forgotten): a bounded request
    * list of user ids is broadcast anti-joined across every
    * user-keyed table, the surviving rows are REWRITTEN as a new
    * corpus version, and the audit row reports before/removed/after
    * with `after` counted from the read-back — so the number proves
    * the physical propagation, not the plan. Scale shape: the request
    * list is bounded (people, not rows) and broadcasts; each table
    * pays one scan + one write; nothing shuffles.
    */
  def forget(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = table(spark, sfDir, "events")
    // the request list: a deterministic bounded cohort of real users
    val requests = ev.select(col("user_id")).distinct()
      .where(pmod(col("user_id"), lit(97)) === 0)
    val out = Paths.get(fixRoot(sfDir), "forget_out")
    deleteRec(out)
    ev.join(broadcast(requests), Seq("user_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$out/events")
    val after = spark.read.parquet(s"$out/events").count()
    val before = ev.count()
    val nUsers = requests.count()
    import spark.implicits._
    Seq(("events", before, before - after, after, nUsers))
      .toDF("table_name", "n_before", "n_removed", "n_after", "n_users_forgotten")
  }

  def forgetSql: String =
    """SELECT 'events' AS table_name,
      |  count(*) AS n_before,
      |  CAST(sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_removed,
      |  CAST(sum(CASE WHEN user_id % 97 = 0 THEN 0 ELSE 1 END) AS BIGINT)
      |    AS n_after,
      |  CAST(count(DISTINCT CASE WHEN user_id % 97 = 0 THEN user_id END)
      |    AS BIGINT) AS n_users_forgotten
      |FROM events""".stripMargin

  // ------------------------------------------------------------- T7
  private val partGencolDdl =
    """CREATE TABLE part_g (
      |  p_partkey bigint NOT NULL,
      |  p_name varchar(55),
      |  p_retailprice double,
      |  price_cents bigint AS (floor(p_retailprice * 100)) STORED,
      |  name_len int AS (length(p_name)) VIRTUAL,
      |  tag varchar(80) AS (concat(p_name, '#', p_partkey)) STORED,
      |  key_mod int AS (p_partkey % 7) STORED,
      |  chain1 bigint AS (key_mod + 1) STORED,
      |  chain2 bigint AS (chain1 * 2) STORED,
      |  PRIMARY KEY (p_partkey)
      |);""".stripMargin

  /** Generated columns (T7): six `AS (expr)` columns including a
    * chained pair (chain2 ← chain1 ← key_mod) that forces declared-
    * order evaluation, exactly the reference's `gencol.nested` case.
    */
  def gencol(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = MysqlDdl.parse(partGencolDdl)
    val base = table(spark, sfDir, "part")
      .select("p_partkey", "p_name", "p_retailprice")
    GeneratedColumns(RowTransform.applySchema(base, schema), schema)
      .orderBy("p_partkey")
  }

  def gencolSql: String =
    """SELECT p_partkey, p_name, p_retailprice,
      |  CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents,
      |  CAST(length(p_name) AS INT) AS name_len,
      |  p_name || '#' || CAST(p_partkey AS VARCHAR) AS tag,
      |  CAST(p_partkey % 7 AS INT) AS key_mod,
      |  CAST((p_partkey % 7) + 1 AS BIGINT) AS chain1,
      |  CAST(((p_partkey % 7) + 1) * 2 AS BIGINT) AS chain2
      |FROM part ORDER BY p_partkey""".stripMargin

  private val partFuncsDdl =
    """CREATE TABLE part_f (
      |  p_partkey bigint NOT NULL,
      |  p_name varchar(55),
      |  pk_sq double AS (pow(p_partkey % 5, 2)) STORED,
      |  xs varchar(10) AS (repeat('x', p_partkey % 3)) STORED,
      |  uname varchar(55) AS (upper(p_name)) VIRTUAL,
      |  prefix varchar(8) AS (substr(p_name, 1, 4)) STORED,
      |  hexkey varchar(20) AS (hex(p_partkey)) STORED,
      |  sh2 varchar(64) AS (sha2(p_name, 256)) STORED,
      |  ts0 varchar(19) AS (from_unixtime(p_partkey * 3600)) STORED,
      |  wk bigint AS (week(from_unixtime(p_partkey * 86400))) STORED,
      |  un varchar(4) AS (unhex(hex(p_partkey % 26 + 65))) STORED,
      |  PRIMARY KEY (p_partkey)
      |);""".stripMargin

  /** Wider generated-column function palette (SURVEY §2.8): pow,
    * repeat, upper, substr, hex, sha2, from_unixtime, week (→ ISO
    * weekofyear), unhex — each evaluated through the MySQL → Catalyst
    * translation and replayed by the oracle. (sha1/aes_encrypt also
    * parse as Spark builtins but DuckDB has no twin, so the
    * oracle-checked set uses sha2.)
    */
  def gencolFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = MysqlDdl.parse(partFuncsDdl)
    val base = table(spark, sfDir, "part").select("p_partkey", "p_name")
    GeneratedColumns(RowTransform.applySchema(base, schema), schema)
      .orderBy("p_partkey")
  }

  def gencolFuncsSql: String =
    """SELECT p_partkey, p_name,
      |  pow(p_partkey % 5, 2) AS pk_sq,
      |  repeat('x', CAST(p_partkey % 3 AS INT)) AS xs,
      |  upper(p_name) AS uname,
      |  substr(p_name, 1, 4) AS prefix,
      |  upper(to_hex(p_partkey)) AS hexkey,
      |  sha256(p_name) AS sh2,
      |  strftime(to_timestamp(p_partkey * 3600), '%Y-%m-%d %H:%M:%S') AS ts0,
      |  CAST(week(CAST(to_timestamp(p_partkey * 86400) AS DATE)) AS BIGINT) AS wk,
      |  decode(unhex(to_hex(p_partkey % 26 + 65))) AS un
      |FROM part ORDER BY p_partkey""".stripMargin

  private val ordersGenDdl =
    """CREATE TABLE orders_g (
      |  o_orderkey bigint NOT NULL,
      |  o_totalprice double,
      |  o_orderdate datetime,
      |  o_orderpriority varchar(20),
      |  day_name varchar(12) AS (date_format(o_orderdate, '%W')) STORED,
      |  ym varchar(8) AS (date_format(o_orderdate, '%Y-%m')) STORED,
      |  md varchar(16) AS (mid(o_orderpriority, 3, 6)) STORED,
      |  uc varchar(20) AS (ucase(o_orderpriority)) VIRTUAL,
      |  nd bigint AS (to_days(o_orderdate)) STORED,
      |  tp1 double AS (truncate(o_totalprice, 1)) STORED,
      |  oc varchar(24) AS (oct(o_orderkey)) STORED,
      |  rt datetime AS (str_to_date(date_format(o_orderdate, '%Y-%m-%d %H:%i:%s'), '%Y-%m-%d %H:%i:%s')) STORED,
      |  PRIMARY KEY (o_orderkey)
      |);""".stripMargin

  /** Date/time + numeric generated-column palette with no literal Spark
    * twin: MySQL %-format strings (date_format, str_to_date round
    * trip), to_days' year-0 epoch, truncate-toward-zero, oct, and the
    * ucase/mid alias spellings — all through the same MySQL → Catalyst
    * translation ([[GeneratedColumns.translate]]), oracle-replayed.
    */
  def gencolDatetime(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = MysqlDdl.parse(ordersGenDdl)
    val base = table(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderdate", "o_orderpriority")
    GeneratedColumns(RowTransform.applySchema(base, schema), schema)
      .orderBy("o_orderkey")
  }

  def gencolDatetimeSql: String =
    """SELECT o_orderkey, o_totalprice, o_orderdate, o_orderpriority,
      |  strftime(o_orderdate, '%A') AS day_name,
      |  strftime(o_orderdate, '%Y-%m') AS ym,
      |  substr(o_orderpriority, 3, 6) AS md,
      |  upper(o_orderpriority) AS uc,
      |  CAST(date_diff('day', DATE '0001-01-01', CAST(o_orderdate AS DATE)) + 366 AS BIGINT) AS nd,
      |  sign(o_totalprice) * floor(abs(o_totalprice) * power(10, 1)) / power(10, 1) AS tp1,
      |  printf('%o', o_orderkey) AS oc,
      |  strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS rt
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------- §3.1 end-to-end
  private val nationDdl =
    """CREATE TABLE nation (
      |  n_nationkey int NOT NULL,
      |  n_name varchar(25),
      |  n_regionkey int,
      |  PRIMARY KEY (n_nationkey)
      |);""".stripMargin
  private val supplierDdl =
    """CREATE TABLE supplier (
      |  s_suppkey bigint NOT NULL,
      |  s_name varchar(25),
      |  s_nationkey int,
      |  s_acctbal double,
      |  PRIMARY KEY (s_suppkey)
      |);""".stripMargin
  private val regionDdl =
    """CREATE TABLE region (
      |  r_regionkey int NOT NULL,
      |  r_name varchar(25),
      |  PRIMARY KEY (r_regionkey)
      |);""".stripMargin

  /** Build a MyDumper-layout source dir from the sf tables:
    * nation as two CSV shards under sharded schemas (tpch_s0/tpch_s1,
    * merged by a table route), supplier as an INSERT dump, region as a
    * parquet data file, plus a junk table excluded by the filter.
    */
  private def buildFixture(spark: SparkSession, sfDir: String): String = {
    val root = Paths.get(fixRoot(sfDir), "mydumper_src")
    if (Files.exists(root.resolve("_done"))) return root.toString
    deleteRec(root)
    Files.createDirectories(root)

    def writeText(name: String, content: String): Unit =
      Files.writeString(root.resolve(name), content)

    // sharded nation CSVs
    val nation = table(spark, sfDir, "nation")
    Seq(0, 1).foreach { shard =>
      val df = nation.filter(pmod(col("n_nationkey"), lit(2)) === shard)
      writeSingle(spark, MySqlCsvText(df), root.resolve(s"tpch_s$shard.nation.0001.csv"))
      writeText(s"tpch_s$shard.nation-schema.sql", nationDdl)
    }
    // supplier INSERT dump
    val supplier = table(spark, sfDir, "supplier")
    writeSingleDf(InsertDumpWriter.statements(supplier, "supplier", 11),
      root.resolve("tpch.supplier.0001.sql"))
    writeText("tpch.supplier-schema.sql", supplierDdl)
    // region parquet (MyDumper-named data file)
    val regionTmp = Paths.get(fixRoot(sfDir), "region_pq")
    table(spark, sfDir, "region").coalesce(1).write.mode("overwrite")
      .parquet(regionTmp.toString)
    val pf = Files.list(regionTmp).filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    Files.copy(pf, root.resolve("tpch.region.0001.parquet"))
    writeText("tpch.region-schema.sql", regionDdl)
    // junk table the filter must exclude
    writeText("tpch.junk-schema.sql", "CREATE TABLE junk (x int);")
    writeText("tpch.junk.0001.csv", "999\n")
    Files.writeString(root.resolve("_done"), "ok")
    root.toString
  }

  private case class MySqlCsvText(df: DataFrame)

  private def writeSingle(spark: SparkSession, src: MySqlCsvText, target: Path,
      dialect: graft.sources.CsvDialect = graft.sources.CsvDialect()): Unit = {
    val tmp = target.getParent.resolve(target.getFileName.toString + ".tmpdir")
    MySqlCsv.writeRaw(src.df.coalesce(1), tmp.toString, dialect)
    moveSinglePart(tmp, target)
  }

  private def writeSingleDf(df: DataFrame, target: Path): Unit = {
    val tmp = target.getParent.resolve(target.getFileName.toString + ".tmpdir")
    df.coalesce(1).write.mode("overwrite").text(tmp.toString)
    moveSinglePart(tmp, target)
  }

  private def moveSinglePart(tmpDir: Path, target: Path): Unit = {
    val part = Files.list(tmpDir)
      .filter(p => p.getFileName.toString.startsWith("part-")).findFirst().get()
    Files.move(part, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    deleteRec(tmpDir)
  }

  private def deleteRec(p: Path): Unit = graft.GraftSession.deleteRec(p)

  // -------------------------------- partitioned-table output layout
  /** `PARTITION BY` DDL → partitioned parquet layout
    * (`tests/partitioned-table` analog): nation declared
    * `PARTITION BY HASH(n_regionkey)` imports into one directory per
    * region key; the probe reads back through the layout with a
    * partition-key filter, which prunes at the file listing (the
    * pruning property itself is pinned in PartitionedIngestSpec).
    */
  private val nationPartDdl =
    """CREATE TABLE nation (
      |  n_nationkey int NOT NULL,
      |  n_name varchar(25),
      |  n_regionkey int,
      |  PRIMARY KEY (n_nationkey)
      |) partition by hash(n_regionkey) partitions 5;""".stripMargin

  private val partIngested = scala.collection.mutable.Set[String]()

  private def ingestPartitionedFixture(spark: SparkSession, sfDir: String): String = synchronized {
    val root = Paths.get(fixRoot(sfDir), "part_src")
    if (!Files.exists(root.resolve("_done"))) {
      deleteRec(root)
      Files.createDirectories(root)
      writeSingle(spark, MySqlCsvText(table(spark, sfDir, "nation")),
        root.resolve("tpch.nation.0001.csv"))
      Files.writeString(root.resolve("tpch.nation-schema.sql"), nationPartDdl)
      Files.writeString(root.resolve("_done"), "ok")
    }
    val target = s"${fixRoot(sfDir)}/part_ingest_out"
    if (!partIngested.contains(target)) {
      deleteRec(Paths.get(target))
      val r = Ingest.run(spark, Ingest.Config(root.toString, target)).head
      require(r.checksumOk, s"partitioned ingest failed verification: $r")
      partIngested += target
    }
    target
  }

  def partitionedE2e(spark: SparkSession, sfDir: String): DataFrame = {
    val target = ingestPartitionedFixture(spark, sfDir)
    spark.read.parquet(s"$target/tpch.nation")
      .filter(col("n_regionkey") === 2)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey").cast("int"))
      .orderBy("n_nationkey")
  }

  def partitionedE2eSql: String =
    """SELECT n_nationkey, n_name, CAST(n_regionkey AS INT) AS n_regionkey
      |FROM nation WHERE n_regionkey = 2 ORDER BY n_nationkey""".stripMargin

  // ----------------------------------------- S8 (gz) + view restore
  private def gzipFile(src: Path, dst: Path): Unit = {
    val in = Files.newInputStream(src)
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(dst))
    try in.transferTo(out)
    finally { in.close(); out.close() }
  }

  /** Fixture for the compressed-source + view path: nation arrives as a
    * gzip CSV (S8 — Spark decompresses by extension, exceeding the
    * reference which rejects compressed sources), plus a MySQL-style
    * view schema over it (reference restores views last,
    * `lightning/restore/restore.go:443-448`).
    */
  private def buildViewFixture(spark: SparkSession, sfDir: String): String = {
    val root = Paths.get(fixRoot(sfDir), "view_src")
    if (Files.exists(root.resolve("_done"))) return root.toString
    deleteRec(root)
    Files.createDirectories(root)
    val tmp = root.resolve("nation_plain.csv")
    writeSingle(spark, MySqlCsvText(table(spark, sfDir, "nation")), tmp)
    gzipFile(tmp, root.resolve("tpch.nation.0001.csv.gz"))
    Files.delete(tmp)
    Files.writeString(root.resolve("tpch.nation-schema.sql"), nationDdl)
    Files.writeString(root.resolve("tpch.top_nations-schema-view.sql"),
      """CREATE ALGORITHM=UNDEFINED SQL SECURITY DEFINER VIEW `top_nations` AS
        |SELECT n_regionkey, count(*) AS n_nations FROM nation GROUP BY n_regionkey;
        |""".stripMargin)
    Files.writeString(root.resolve("_done"), "ok")
    root.toString
  }

  // once per JVM: both q_csv_gz and q_view read this import's output
  private val viewIngested = scala.collection.mutable.Set[String]()

  private def ingestViewFixture(spark: SparkSession, sfDir: String): String = synchronized {
    val src = buildViewFixture(spark, sfDir)
    val target = s"${fixRoot(sfDir)}/view_ingest_out"
    if (!viewIngested.contains(target)) {
      deleteRec(Paths.get(target))
      Ingest.run(spark, Ingest.Config(sourceDir = src, targetDir = target))
      viewIngested += target
    }
    target
  }

  /** Compressed source end-to-end (S8): the gzip CSV goes through
    * route → decompress → parse → cast → checksum-verified sorted
    * write; read the imported table back.
    */
  def csvGz(spark: SparkSession, sfDir: String): DataFrame = {
    val target = ingestViewFixture(spark, sfDir)
    spark.read.parquet(s"$target/tpch.nation")
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey")
  }

  def csvGzSql: String =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"

  /** View restore: query THROUGH the restored view, whose defining
    * SELECT was replayed over the imported table.
    */
  def viewRestore(spark: SparkSession, sfDir: String): DataFrame = {
    ingestViewFixture(spark, sfDir)
    spark.table("top_nations").orderBy("n_regionkey")
  }

  def viewRestoreSql: String =
    """SELECT n_regionkey, count(*) AS n_nations FROM nation
      |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** Pre-build the on-disk fixtures (MyDumper dir, view/gz dir, error
    * fixture) so benchmark timings measure the operators, not the
    * scaffolding that generates their inputs.
    */
  def warmFixtures(spark: SparkSession, sfDir: String): Unit = {
    buildFixture(spark, sfDir)
    buildViewFixture(spark, sfDir)
    errorFixture(spark, sfDir)
    autoIncFixture(spark, sfDir)
  }

  // ------------------------------------------------ T4 auto-increment
  /** Fixture: customer arrives WITHOUT its declared AUTO_INCREMENT id
    * column — two header-carrying CSV shards of payload columns only.
    */
  private def autoIncFixture(spark: SparkSession, sfDir: String): String = {
    val root = Paths.get(fixRoot(sfDir), "autoinc_src")
    if (Files.exists(root.resolve("_done"))) return root.toString
    deleteRec(root)
    Files.createDirectories(root)
    Files.writeString(root.resolve("tpch.cust_ai-schema.sql"),
      """CREATE TABLE cust_ai (
        |  id bigint NOT NULL AUTO_INCREMENT,
        |  c_name varchar(25),
        |  c_acctbal double,
        |  PRIMARY KEY (id)
        |);""".stripMargin)
    val cust = table(spark, sfDir, "customer").select("c_custkey", "c_name", "c_acctbal")
    Seq(0, 1).foreach { shard =>
      val df = cust.filter(pmod(col("c_custkey"), lit(2)) === shard)
        .select("c_name", "c_acctbal")
      writeSingle(spark, MySqlCsvText(df),
        root.resolve(s"tpch.cust_ai.000$shard.csv"),
        graft.sources.CsvDialect(header = true))
    }
    Files.writeString(root.resolve("_done"), "ok")
    root.toString
  }

  /** Auto-increment synthesis end-to-end (T4, reference
    * `lightning/backend/sql2kv.go:310-312` + allocator rebase): the id
    * column is absent from the source files, so the import synthesizes
    * chunk-based IDs. The oracle-checkable contract is uniqueness +
    * row preservation, not density — the reference's estimated chunk
    * ranges leave ID gaps exactly the same way.
    */
  def autoIncE2e(spark: SparkSession, sfDir: String): DataFrame = {
    val src = autoIncFixture(spark, sfDir)
    val target = s"${fixRoot(sfDir)}/autoinc_out"
    deleteRec(Paths.get(target))
    Ingest.run(spark, Ingest.Config(sourceDir = src, targetDir = target,
      csvDialect = graft.sources.CsvDialect(header = true)))
    spark.read.parquet(s"$target/tpch.cust_ai")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("id")).as("n_ids"),
        count(when(col("id").isNull, 1)).as("n_null_ids"),
        sum(graft.functions.TextFunctions.quant4(col("c_acctbal"))).as("sum_bal"))
  }

  def autoIncE2eSql: String =
    """SELECT count(*) AS n_rows, count(*) AS n_ids,
      |  CAST(0 AS BIGINT) AS n_null_ids,
      |  CAST(sum(CAST(floor(c_acctbal*10000) AS BIGINT)) AS BIGINT) AS sum_bal
      |FROM customer""".stripMargin

  private def errorFixture(spark: SparkSession, sfDir: String): String = {
    val root = Paths.get(fixRoot(sfDir), "errsum_src")
    if (!Files.exists(root.resolve("_done"))) {
      deleteRec(root)
      Files.createDirectories(root)
      Files.writeString(root.resolve("tpch.badnums-schema.sql"),
        "CREATE TABLE badnums (id bigint NOT NULL, n bigint, PRIMARY KEY (id));")
      val lines = (1 to 10)
        .map(i => s"$i,${if (i % 3 == 0) "x" + i else i * 100}").mkString("\n")
      Files.writeString(root.resolve("tpch.badnums.0001.csv"), lines + "\n")
      Files.writeString(root.resolve("_done"), "ok")
    }
    root.toString
  }

  /** Error summary (reference `tests/error_summary` + max-error): a
    * fixture with 3 unparsable bigints in 10 rows; the cast-error
    * counter rides the write pass as an observed metric and surfaces
    * per table.
    */
  def errorSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val root = errorFixture(spark, sfDir)
    val target = s"${fixRoot(sfDir)}/errsum_out"
    deleteRec(Paths.get(target))
    val reports = Ingest.run(spark, Ingest.Config(root, target))
    import spark.implicits._
    reports.map(r => (r.table, r.nRows, r.badRows))
      .toDF("table_name", "n_rows", "bad_rows")
  }

  def errorSummarySql: String =
    """SELECT 'badnums' AS table_name, CAST(10 AS BIGINT) AS n_rows,
      |  CAST(3 AS BIGINT) AS bad_rows""".stripMargin

  /** The full one-shot import over the fixture dir: shard-merge route,
    * filter, three source formats, checksum-verified sorted writes.
    * Reports (table, rows, checksum_ok) per restored table.
    */
  def ingestE2e(spark: SparkSession, sfDir: String): DataFrame = {
    val src = buildFixture(spark, sfDir)
    val target = s"${fixRoot(sfDir)}/ingest_out"
    deleteRec(Paths.get(target))
    val reports = Ingest.run(spark, Ingest.Config(
      sourceDir = src,
      targetDir = target,
      filters = Seq("tpch*.*", "!tpch.junk"),
      routes = Seq(TableRoute("tpch_s*", "nation", "tpch", "nation")),
      // three tables restore from three driver threads; their job
      // chains interleave so no table's low-parallelism tail idles
      // the executors (reference table-concurrency)
      tableConcurrency = 3))
    import spark.implicits._
    reports.map(r => (r.table, r.nRows, r.checksumOk))
      .toDF("table_name", "n_rows", "checksum_ok")
      .orderBy("table_name")
  }

  def ingestE2eSql: String =
    """SELECT * FROM (
      |  SELECT 'nation' AS table_name, count(*) AS n_rows, TRUE AS checksum_ok FROM nation
      |  UNION ALL SELECT 'region', count(*), TRUE FROM region
      |  UNION ALL SELECT 'supplier', count(*), TRUE FROM supplier
      |) ORDER BY table_name""".stripMargin

  /** The ORC leg of the output-format knob (`tikv-importer
    * .output-format = "orc"`, SURVEY "Bulk Parquet/ORC write"), driven
    * through the SAME full import as `q_ingest_e2e`: fixture in, ORC
    * files out, and the checksum gate READS THE OUTPUT BACK through
    * the ORC reader — a mislabeled parquet file would fail the
    * read-back, and a corrupted value flips `checksum_ok`. The format
    * column pins which sink family produced the rows; the oracle
    * computes the same counts from the source tables.
    */
  def orcE2e(spark: SparkSession, sfDir: String): DataFrame = {
    val src = buildFixture(spark, sfDir)
    val target = s"${fixRoot(sfDir)}/ingest_orc_out"
    deleteRec(Paths.get(target))
    val reports = Ingest.run(spark, Ingest.Config(
      sourceDir = src,
      targetDir = target,
      filters = Seq("tpch*.*", "!tpch.junk"),
      routes = Seq(TableRoute("tpch_s*", "nation", "tpch", "nation")),
      tableConcurrency = 3,
      outputFormat = "orc"))
    import spark.implicits._
    reports.map(r => (r.table, r.nRows, r.checksumOk, "orc"))
      .toDF("table_name", "n_rows", "checksum_ok", "format")
      .orderBy("table_name")
  }

  def orcE2eSql: String =
    """SELECT *, 'orc' AS format FROM (
      |  SELECT 'nation' AS table_name, count(*) AS n_rows, TRUE AS checksum_ok FROM nation
      |  UNION ALL SELECT 'region', count(*), TRUE FROM region
      |  UNION ALL SELECT 'supplier', count(*), TRUE FROM supplier
      |) ORDER BY table_name""".stripMargin

  /** The reference's primary UX, end to end: a verbatim
    * `tidb-lightning.toml`-shaped config (filter, shard-merge routes,
    * CSV dialect, file checkpoint, post-restore levels) loaded by
    * [[TomlConfig]] drives the same three-format fixture import as
    * `q_ingest_e2e` — config text in, checksum-verified tables out.
    * `analyze = "off"` exercises the PostOpLevel tri-state on the way.
    */
  def tomlE2e(spark: SparkSession, sfDir: String): DataFrame = {
    val src = buildFixture(spark, sfDir)
    val target = s"${fixRoot(sfDir)}/toml_out"
    deleteRec(Paths.get(target))
    val toml =
      s"""# reference-shaped config (sample: tidb-lightning.toml)
         |[lightning]
         |server-mode = false
         |table-concurrency = 3
         |
         |[checkpoint]
         |enable = true
         |driver = "file"
         |
         |[tikv-importer]
         |backend = "local"
         |sorted-kv-dir = '$target'
         |
         |[mydumper]
         |data-source-dir = '$src'
         |filter = ['tpch*.*', '!tpch.junk']
         |character-set = "auto"
         |max-region-size = '256MiB'
         |
         |[mydumper.csv]
         |separator = ','
         |delimiter = '"'
         |header = false
         |null = '\\N'
         |backslash-escape = true
         |
         |[[routes]]
         |schema-pattern = "tpch_s*"
         |table-pattern = "nation"
         |target-schema = "tpch"
         |target-table = "nation"
         |
         |[post-restore]
         |checksum = "required"
         |analyze = "off"
         |""".stripMargin
    val loaded = TomlConfig.load(toml)
    val reports = Ingest.run(spark, loaded.config)
    import spark.implicits._
    reports.map(r => (r.table, r.nRows, r.checksumOk))
      .toDF("table_name", "n_rows", "checksum_ok")
      .orderBy("table_name")
  }

  def tomlE2eSql: String = ingestE2eSql
}
