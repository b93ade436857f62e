package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession.table
import graft.discover.{FileKind, FileRouter, TableFilter, TableRoute, TableRouter}
import graft.pipeline.Ingest
import graft.schema.MysqlDdl
import graft.sink.{InsertDumpWriter, SortedParquetSink}
import graft.sources.{CsvDialect, DumpSource, MySqlCsv}
import graft.transform.RowTransform
import graft.verify.Checksum

/** End-to-end queries over the ingest pipeline operators (SURVEY §2.1–
  * §2.5). Round-trip queries generate their own MyDumper-style fixture
  * from the sf tables, push it through the real source/sink code, and
  * compare to the original table via the DuckDB oracle — the same
  * golden-probe style as the reference's integration tests.
  */
object IngestQueries {

  // Exact-integer money sums (engine-identical across Spark/DuckDB,
  // see CoreQueries numeric policy).
  private def quant(c: String) = graft.functions.TextFunctions.quant4(col(c))

  private def fixDir(sfDir: String, name: String): String =
    s"${graft.GraftSession.fixtureRoot(sfDir)}/$name"


  // ---------------------------------------------------------------- S2
  /** File router golden check over MyDumper naming (S2). */
  def fileRoute(spark: SparkSession, sfDir: String): DataFrame = {
    val router = new FileRouter()
    val paths = Seq(
      "tpch-schema-create.sql",
      "tpch.lineitem-schema.sql",
      "tpch.lineitem.0001.csv",
      "tpch.orders.sql",
      "tpch.part.42.parquet",
      "tpch.events.csv.gz",
      "tpch.v1-schema-view.sql",
      "README.txt")
    import spark.implicits._
    paths.map { p =>
      router.route(p) match {
        case Some(r) =>
          (p, r.database, r.table, r.kind.toString, r.compression.orNull, r.sortKey)
        case None => (p, null, null, "Ignore", null, null)
      }
    }.toDF("path", "db", "tbl", "kind", "compression", "sort_key")
      .orderBy("path")
  }

  def fileRouteSql: String =
    """SELECT * FROM (VALUES
      |  ('README.txt', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'Ignore', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
      |  ('tpch-schema-create.sql', 'tpch', '', 'SchemaSchema', CAST(NULL AS VARCHAR), ''),
      |  ('tpch.events.csv.gz', 'tpch', 'events', 'Csv', 'gz', ''),
      |  ('tpch.lineitem-schema.sql', 'tpch', 'lineitem', 'TableSchema', CAST(NULL AS VARCHAR), ''),
      |  ('tpch.lineitem.0001.csv', 'tpch', 'lineitem', 'Csv', CAST(NULL AS VARCHAR), '0001'),
      |  ('tpch.orders.sql', 'tpch', 'orders', 'Sql', CAST(NULL AS VARCHAR), ''),
      |  ('tpch.part.42.parquet', 'tpch', 'part', 'Parquet', CAST(NULL AS VARCHAR), '42'),
      |  ('tpch.v1-schema-view.sql', 'tpch', 'v1', 'ViewSchema', CAST(NULL AS VARCHAR), '')
      |) AS t(path, db, tbl, kind, compression, sort_key)
      |ORDER BY path""".stripMargin

  // ------------------------------------------------------------ schema
  private val paletteDdl =
    """CREATE TABLE IF NOT EXISTS `db`.`t` (
      |  `id` bigint(20) UNSIGNED NOT NULL AUTO_INCREMENT,
      |  `name` varchar(128) DEFAULT 'anon',
      |  `ratio` decimal(6,4),
      |  `flags` bit(4),
      |  `tags` set('a','b','c'),
      |  `status` enum('YES','NO') NOT NULL DEFAULT 'YES',
      |  `created` timestamp DEFAULT CURRENT_TIMESTAMP,
      |  `payload` longblob,
      |  `doubled` int AS (id * 2) STORED,
      |  PRIMARY KEY (`id`),
      |  KEY `idx_name` (`name`)
      |);""".stripMargin

  /** MySQL DDL → Spark schema golden check (SURVEY §1.2 type map). */
  def ddlSchema(spark: SparkSession, sfDir: String): DataFrame = {
    val ts = MysqlDdl.parse(paletteDdl)
    import spark.implicits._
    ts.columns.zipWithIndex.map { case (c, i) =>
      (i.toLong, c.name, c.sparkType.simpleString, c.nullable,
        c.default.orNull, c.autoIncrement, c.generated.isDefined)
    }.toDF("ordinal", "col_name", "spark_type", "nullable",
        "default_val", "auto_inc", "generated")
      .orderBy("ordinal")
  }

  def ddlSchemaSql: String =
    """SELECT * FROM (VALUES
      |  (CAST(0 AS BIGINT), 'id', 'decimal(20,0)', FALSE, CAST(NULL AS VARCHAR), TRUE, FALSE),
      |  (CAST(1 AS BIGINT), 'name', 'string', TRUE, 'anon', FALSE, FALSE),
      |  (CAST(2 AS BIGINT), 'ratio', 'decimal(6,4)', TRUE, CAST(NULL AS VARCHAR), FALSE, FALSE),
      |  (CAST(3 AS BIGINT), 'flags', 'bigint', TRUE, CAST(NULL AS VARCHAR), FALSE, FALSE),
      |  (CAST(4 AS BIGINT), 'tags', 'string', TRUE, CAST(NULL AS VARCHAR), FALSE, FALSE),
      |  (CAST(5 AS BIGINT), 'status', 'string', FALSE, 'YES', FALSE, FALSE),
      |  (CAST(6 AS BIGINT), 'created', 'timestamp', TRUE, 'CURRENT_TIMESTAMP', FALSE, FALSE),
      |  (CAST(7 AS BIGINT), 'payload', 'binary', TRUE, CAST(NULL AS VARCHAR), FALSE, FALSE),
      |  (CAST(8 AS BIGINT), 'doubled', 'int', TRUE, CAST(NULL AS VARCHAR), FALSE, TRUE)
      |) AS t(ordinal, col_name, spark_type, nullable, default_val, auto_inc, generated)
      |ORDER BY ordinal""".stripMargin

  // ------------------------------------------------------------ S3
  /** Table filter (S3): wildcard allow-list selects which tables are
    * read at all — filter-before-scan, the cheapest pushdown there is.
    */
  def tableFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val filter = new TableFilter(Seq("tpch.n*", "tpch.r*", "!tpch.nothing"))
    val kept = graft.GraftSession.tableNames.filter(t => filter.matches("tpch", t))
    kept.map { t =>
      table(spark, sfDir, t).agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("table_name"), col("n_rows"))
    }.reduce(_.unionByName(_)).orderBy("table_name")
  }

  def tableFilterSql: String =
    """SELECT 'nation' AS table_name, count(*) AS n_rows FROM nation
      |UNION ALL SELECT 'region', count(*) FROM region
      |ORDER BY table_name""".stripMargin

  // ------------------------------------------------------------ S4
  /** Shard-merge routing (S4): N source shards route to one target
    * table and union. Scale shape: unionByName is plan-level only — no
    * shuffle, the shards' files simply concatenate into one scan.
    */
  def shardMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = table(spark, sfDir, "orders")
    val shards = (0 until 3).map { k =>
      (s"orders_$k", orders.filter(pmod(col("o_orderkey"), lit(3)) === k))
    }
    val router = new TableRouter(Seq(TableRoute("tpch", "orders_*", "tpch", "orders_all")))
    val merged = shards
      .groupBy { case (name, _) => router.route("tpch", name) }
      .map { case (_, dfs) => dfs.map(_._2).reduce(_.unionByName(_)) }
      .head
    merged.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), sum(quant("o_totalprice")).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  def shardMergeSql: String =
    """SELECT o_orderstatus, count(*) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice*10000) AS BIGINT)) AS BIGINT) AS sum_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------------------------ T1/T3
  private val customerDdl =
    """CREATE TABLE customer (
      |  c_custkey bigint NOT NULL,
      |  c_name varchar(25),
      |  c_nationkey int,
      |  c_acctbal double,
      |  c_mktsegment varchar(10) NOT NULL DEFAULT 'BUILDING',
      |  PRIMARY KEY (c_custkey)
      |);""".stripMargin

  /** Column permutation + default fill (T1+T3): file columns arrive
    * reordered and missing c_mktsegment; the permutation projects onto
    * the table schema and fills the DEFAULT. Pure select — fuses into
    * the scan.
    */
  def columnPermutation(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = MysqlDdl.parse(customerDdl)
    val fileDf = table(spark, sfDir, "customer")
      .select("c_name", "c_acctbal", "c_nationkey", "c_custkey") // permuted + missing col
    RowTransform.applySchema(fileDf, schema).orderBy("c_custkey")
  }

  def columnPermutationSql: String =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal,
      |  'BUILDING' AS c_mktsegment
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------ T2
  private val eventsDdl =
    """CREATE TABLE events (
      |  event_id bigint NOT NULL,
      |  ts datetime,
      |  user_id bigint,
      |  event_type varchar(20),
      |  value double,
      |  props json
      |);""".stripMargin

  /** Late-typed cast palette (T2): every column is stringified (the
    * state CSV/dump parsers deliver rows in, SURVEY §1.2) and cast back
    * to its declared type — bigint, datetime, varchar, double, json.
    */
  def typeCast(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = MysqlDdl.parse(eventsDdl)
    val stringified = table(spark, sfDir, "events")
      .select(col("event_id").cast(StringType), col("ts").cast(StringType),
        col("user_id").cast(StringType), col("event_type").cast(StringType),
        col("value").cast(StringType), col("props").cast(StringType))
    RowTransform.applySchema(stringified, schema).orderBy("event_id")
  }

  def typeCastSql: String =
    """SELECT event_id, ts, user_id, event_type, value, props
      |FROM events ORDER BY event_id""".stripMargin

  /** SQL-mode switch (T2 strict path, reference
    * `lightning/backend/tidb.go:324-331`, `tests/sqlmode/`): the same
    * stringified input goes through the non-strict cast (bad values →
    * NULL, counted) and the strict cast over the clean subset (which
    * must complete without raising). Bad values are injected on every
    * event_id % 10 == 0 row.
    */
  def strictCast(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = MysqlDdl.parse(
      "CREATE TABLE t (event_id bigint NOT NULL, value double);")
    val src = table(spark, sfDir, "events")
      .select(col("event_id").cast(StringType).as("event_id"),
        when(pmod(col("event_id"), lit(10)) === 0, lit("not-a-number"))
          .otherwise(col("value").cast(StringType)).as("value"))
    val nonStrict = RowTransform.applySchema(src, schema)
    val clean = src.filter(pmod(col("event_id").cast(LongType), lit(10)) =!= 0)
    val strictOk = RowTransform.applySchema(clean, schema, strict = true)
    nonStrict
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("value").isNull, 1)).as("n_nulled"))
      .crossJoin(strictOk.agg(count(lit(1)).as("n_strict_rows")))
  }

  def strictCastSql: String =
    """SELECT count(*) AS n_rows,
      |  count(CASE WHEN event_id % 10 = 0 OR value IS NULL THEN 1 END) AS n_nulled,
      |  (SELECT count(*) FROM events WHERE event_id % 10 <> 0) AS n_strict_rows
      |FROM events""".stripMargin

  /** MySQL non-strict coercions (T2 lenient path, reference
    * `tests/sqlmode/off.toml` — replayed e2e on the fixture itself in
    * `SqlModeSpec`; this query puts the same kernel under the DuckDB
    * oracle): tinyint clamping both ends, decimal rounding, NaN→0,
    * NULL→implicit default on NOT NULL, varchar truncation, SET
    * bitmask decode / dedupe-canonicalize / invalid-member→''.
    */
  def lenientCast(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = MysqlDdl.parse(
      """CREATE TABLE t (event_id bigint NOT NULL, b tinyint NOT NULL,
        |  s varchar(5), st set('x','y') NOT NULL,
        |  d decimal(5,2) NOT NULL, e enum('lo','mid','hi'));""".stripMargin)
    val m5 = pmod(col("event_id"), lit(5))
    val m4 = pmod(col("event_id"), lit(4))
    val m3 = pmod(col("event_id"), lit(3))
    val src = table(spark, sfDir, "events")
      .select(col("event_id").cast(StringType).as("event_id"),
        when(m5 === 0, lit("NaN")).when(m5 === 1, lit("200"))
          .when(m5 === 2, lit("-999")).when(m5 === 3, lit("6.7"))
          .otherwise(lit(null).cast(StringType)).as("b"),
        col("event_type").cast(StringType).as("s"),
        when(m4 === 0, lit("x,y,z")).when(m4 === 1, lit("3"))
          .when(m4 === 2, lit("y,x,y")).otherwise(lit("y")).as("st"),
        // decimal(5,2): overflow clamps to ±999.99, junk → 0
        when(m4 === 0, lit("12345.678")).when(m4 === 1, lit("-12345.678"))
          .when(m4 === 2, lit("1.239")).otherwise(lit("oops")).as("d"),
        // enum: member, ordinal, invalid → '', NULL stays NULL on a
        // nullable column
        when(m3 === 0, lit("mid")).when(m3 === 1, lit("3"))
          .when(pmod(col("event_id"), lit(6)) === 2, lit(null).cast(StringType))
          .otherwise(lit("nope")).as("e"))
    RowTransform.applySchema(src, schema, RowTransform.CastPolicy.Lenient)
      // House numeric policy (see q_various_types_dec): never ship a bare
      // DECIMAL to the driver — Spark's and DuckDB's decimal values
      // stringify differently in its canonicalization even when
      // numerically identical. Stringify at the query boundary only; the
      // lenient kernel itself still produces DECIMAL(5,2).
      .withColumn("d", col("d").cast(StringType))
      .orderBy("event_id")
  }

  def lenientCastSql: String =
    """SELECT event_id,
      |  CASE event_id % 5 WHEN 0 THEN 0 WHEN 1 THEN 127 WHEN 2 THEN -128
      |    WHEN 3 THEN 7 ELSE 0 END AS b,
      |  substr(event_type, 1, 5) AS s,
      |  CASE event_id % 4 WHEN 0 THEN '' WHEN 1 THEN 'x,y' WHEN 2 THEN 'x,y'
      |    ELSE 'y' END AS st,
      |  CAST(CAST(CASE event_id % 4 WHEN 0 THEN '999.99' WHEN 1 THEN '-999.99'
      |    WHEN 2 THEN '1.24' ELSE '0.00' END AS DECIMAL(5,2)) AS VARCHAR) AS d,
      |  CASE WHEN event_id % 3 = 0 THEN 'mid' WHEN event_id % 3 = 1 THEN 'hi'
      |    WHEN event_id % 6 = 2 THEN NULL ELSE '' END AS e
      |FROM events ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------ T4/T6
  /** Deterministic row-ID assignment (T4/T6) with the scalable
    * two-level scheme: range-partition on the business key, sort within
    * partitions, then per-chunk base + local ordinal — no global window,
    * mirroring the reference's PrevRowIDMax ranges
    * (`lightning/mydump/region.go:131-234`).
    */
  def rowidAssign(spark: SparkSession, sfDir: String): DataFrame = {
    val o = table(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
      .repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
    RowTransform.chunkedRowId(o, "row_id").orderBy("o_orderkey")
  }

  def rowidAssignSql: String =
    """SELECT o_orderkey, o_custkey,
      |  row_number() OVER (ORDER BY o_orderkey) AS row_id
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** `_tidb_rowid` through the REAL import (T6 e2e): a varchar-pk
    * table (no integer handle) built from `nation`, imported via
    * `Ingest.run` — the output must carry the pseudo-column, filled
    * densely 1..N in file order (single dump file → statement order →
    * deterministic), so the oracle is a plain row_number replay.
    */
  def rowidE2e(spark: SparkSession, sfDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(fixDir(sfDir, "rowid_e2e_src"))
    val tgt = fixDir(sfDir, "rowid_e2e_out")
    graft.GraftSession.deleteRec(root)
    graft.GraftSession.deleteRec(java.nio.file.Paths.get(tgt))
    java.nio.file.Files.createDirectories(root)
    java.nio.file.Files.writeString(root.resolve("d.nn-schema.sql"),
      "CREATE TABLE nn (n_name varchar(25) NOT NULL, n_regionkey int, PRIMARY KEY (n_name));")
    val rows = table(spark, sfDir, "nation")
      .select("n_name", "n_regionkey").orderBy("n_name").collect()
      .map(r => s"('${r.getString(0)}', ${r.getInt(1)})")
    java.nio.file.Files.writeString(root.resolve("d.nn.0001.sql"),
      s"insert into nn values ${rows.mkString(",\n")};")
    val reports = Ingest.run(spark,
      Ingest.Config(root.toString, tgt, analyze = false))
    require(reports.forall(_.checksumOk), s"rowid e2e checksum: $reports")
    spark.read.parquet(s"$tgt/d.nn")
      .select(col("n_name"), col("n_regionkey"),
        col("_tidb_rowid").cast("long").as("tidb_rowid"))
      .orderBy("n_name")
  }

  def rowidE2eSql: String =
    """SELECT n_name, n_regionkey,
      |  row_number() OVER (ORDER BY n_name) AS tidb_rowid
      |FROM nation ORDER BY n_name""".stripMargin

  // ------------------------------------------------------------ T5
  /** auto_random synthesis (T5): 5 shard bits from the key, low 58 bits
    * from the deterministic row ID (reference
    * `lightning/backend/sql2kv.go:69-77,313-320`).
    */
  def autoRandom(spark: SparkSession, sfDir: String): DataFrame = {
    val withId = rowidAssign(spark, sfDir)
    withId.select(
      col("o_orderkey"),
      RowTransform.autoRandom(col("row_id"), pmod(col("o_orderkey"), lit(32)))
        .as("auto_id"))
      .orderBy("o_orderkey")
  }

  def autoRandomSql: String =
    """SELECT o_orderkey,
      |  ((CAST(o_orderkey AS BIGINT) % 32) << 58)
      |    | (row_number() OVER (ORDER BY o_orderkey) & ((CAST(1 AS BIGINT) << 58) - 1))
      |  AS auto_id
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------------ S6/T8
  private val nationDdl =
    """CREATE TABLE nation (
      |  n_nationkey int NOT NULL,
      |  n_name varchar(25),
      |  n_regionkey int,
      |  PRIMARY KEY (n_nationkey)
      |);""".stripMargin

  /** MySQL-CSV round trip (S6+T8): table → \N-null backslash-escaped
    * CSV text files → MySqlCsv source → DDL casts → identical table.
    */
  def csvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = fixDir(sfDir, "nation_csv")
    val schema = MysqlDdl.parse(nationDdl)
    MySqlCsv.writeRaw(table(spark, sfDir, "nation"), dir)
    MySqlCsv.read(spark, Seq(dir), schema).orderBy("n_nationkey")
  }

  def csvRoundtripSql: String =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"

  /** Multi-char separator CSV path (S6 fallback parser): same round
    * trip through the distributed custom tokenizer Spark's reader
    * cannot handle (reference supports multi-char sep/delim,
    * `lightning/mydump/csv_parser.go:94-107`).
    */
  def csvMultisep(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = fixDir(sfDir, "nation_csv_msep")
    val dialect = CsvDialect(separator = "|+|")
    val schema = MysqlDdl.parse(nationDdl)
    MySqlCsv.writeRaw(table(spark, sfDir, "nation"), dir, dialect)
    MySqlCsv.read(spark, Seq(dir), schema, dialect).orderBy("n_nationkey")
  }

  def csvMultisepSql: String = csvRoundtripSql

  /** Header-name column projection (S6 header → T1): the CSV arrives
    * with reordered, UPPERCASE-named columns and one table column
    * missing entirely; the lowercased header names drive the
    * permutation — not file position — and the missing column gets its
    * DEFAULT (reference `lightning/mydump/csv_parser.go:557-568`,
    * applied `lightning/restore/restore.go:2055-2137`).
    */
  def csvHeader(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = fixDir(sfDir, "customer_csv_hdr")
    val dialect = CsvDialect(header = true)
    val schema = MysqlDdl.parse(customerDdl)
    val reordered = table(spark, sfDir, "customer")
      .select(col("c_name").as("C_NAME"), col("c_acctbal").as("C_ACCTBAL"),
        col("c_nationkey").as("C_NATIONKEY"), col("c_custkey").as("C_CUSTKEY"))
      .repartition(3) // several files, each with its own header line
    MySqlCsv.writeRaw(reordered, dir, dialect)
    MySqlCsv.read(spark, Seq(dir), schema, dialect).orderBy("c_custkey")
  }

  def csvHeaderSql: String = columnPermutationSql

  /** Quote-torture CSV (S6, reference `tests/issue_519`): single-quote
    * delimiter with backslash escapes OFF. MySQL semantics this pins:
    * a doubled delimiter inside a quoted field collapses to one (MySQL
    * always, even with escapes off — expressed on the native reader
    * path as escape == quote, see [[MySqlCsv.readerOptions]]); the
    * field separator and the *other* quote kind ride through quoted
    * fields as data; a backslash is a literal character; the `\N`
    * sentinel still means NULL; quoted whitespace and quoted-empty
    * survive exactly.
    */
  def csvQuoteTorture(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val dir = Paths.get(fixDir(sfDir, "quote_torture_csv"))
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("qt.csv"),
      """'id','a','b'
        |1,'plain','text'
        |2,'''','"'
        |3,'a,b','c''d'
        |4,'\n','x\\y'
        |5,'|*|sep|*|','- '
        |6,'',' '
        |7,\N,'nullleft'
        |""".stripMargin)
    val dialect = CsvDialect(delimiter = "'", header = true, backslashEscape = false)
    val schema = MysqlDdl.parse(
      "CREATE TABLE qt (id int NOT NULL, a text, b text);")
    MySqlCsv.read(spark, Seq(dir.toString), schema, dialect).orderBy("id")
  }

  def csvQuoteTortureSql: String =
    """SELECT * FROM (VALUES
      |  (1, 'plain', 'text'),
      |  (2, '''', '"'),
      |  (3, 'a,b', 'c''d'),
      |  (4, '\n', 'x\\y'),
      |  (5, '|*|sep|*|', '- '),
      |  (6, '', ' '),
      |  (7, CAST(NULL AS VARCHAR), 'nullleft')
      |) AS t(id, a, b) ORDER BY id""".stripMargin

  /** Collation-aware duplicate detection (reference
    * `tests/new_collation`): under utf8mb4_general_ci, `Abc`, `ABC `
    * and `abc` are the SAME key, so a unique check must compare
    * normalized keys ([[graft.functions.Collation.generalCiKey]]), not
    * bytes. The probe builds three binary-distinct variants per
    * customer name (case-flipped, trailing-spaced) and shows the
    * binary-distinct count is 3× the collation-distinct count — the
    * difference is exactly the duplicate set a collation-aware import
    * must police.
    */
  def dedupCollate(spark: SparkSession, sfDir: String): DataFrame = {
    // one scan, narrow explode — not a 3-way self-union (3 scans)
    val variants = table(spark, sfDir, "customer")
      .select(explode(array(col("c_name"), upper(col("c_name")),
        concat(col("c_name"), lit("  ")))).as("c_name"))
    variants.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("c_name")).as("n_binary"),
      countDistinct(graft.functions.Collation.generalCiKey(col("c_name"))).as("n_ci"))
  }

  def dedupCollateSql: String =
    """WITH v AS (
      |  SELECT c_name FROM customer
      |  UNION ALL SELECT upper(c_name) FROM customer
      |  UNION ALL SELECT c_name || '  ' FROM customer
      |)
      |SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(DISTINCT c_name) AS BIGINT) AS n_binary,
      |  CAST(count(DISTINCT lower(rtrim(c_name))) AS BIGINT) AS n_ci
      |FROM v""".stripMargin

  /** Schema-evolution read (the dump-side analog of the reference's
    * column-count tolerance, `tests/checkpoint_columns` /
    * column-permutation): an older batch written WITHOUT a
    * later-added column unions with a newer batch that has it —
    * `mergeSchema` reconciles parquet footers per file, old rows
    * surface NULL for the new column, and no rewrite of the old batch
    * is needed. This is how an append-only 100 TB lake absorbs a
    * column add.
    */
  def schemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val root = fixDir(sfDir, "schema_evo")
    val n = table(spark, sfDir, "nation")
    n.where(col("n_nationkey") < 13).select("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$root/batch1")
    n.where(col("n_nationkey") >= 13)
      .select("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$root/batch2")
    spark.read.option("mergeSchema", "true")
      .parquet(s"$root/batch1", s"$root/batch2")
      .orderBy("n_nationkey")
  }

  def schemaEvolutionSql: String =
    """SELECT n_nationkey, n_name,
      |  CASE WHEN n_nationkey >= 13 THEN n_regionkey END AS n_regionkey
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** Skew diagnostic — the measurement that justifies (or rules out)
    * the salted-join path: exact per-key counts, top keys by weight
    * with a total for the share calculation. One map-side-combined
    * groupBy + a TakeOrdered(10) — no global sort; ties break on the
    * key so the cut is deterministic.
    */
  def skewReport(spark: SparkSession, sfDir: String): DataFrame = {
    val o = table(spark, sfDir, "orders")
    val cnt = o.groupBy("o_custkey").agg(count(lit(1)).as("n"))
    cnt.orderBy(col("n").desc, col("o_custkey")).limit(10)
      .crossJoin(o.agg(count(lit(1)).as("n_total")))
  }

  def skewReportSql: String =
    """WITH c AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM orders)
      |SELECT o_custkey, n, n_total FROM c, t
      |ORDER BY n DESC, o_custkey LIMIT 10""".stripMargin

  /** Exotic-type dump e2e (reference `tests/various_types`): one table
    * exercising the whole §1.2 type-map surface through the dump parser
    * and DDL casts — BINARY via mixed-case `x'…'`/`0x…` hex (non-UTF-8
    * byte patterns, lossless via the parser's hex sentinel), BIT(8) via
    * `b'…'`, DECIMAL(6,4), JSON passthrough, DATETIME(6)/TIMESTAMP(3)
    * fractional seconds, exact DOUBLEs, BIGINT UNSIGNED at the uint64
    * ceiling (→ DECIMAL(20,0)), YEAR, unicode and empty strings, and an
    * all-NULL row. Binary is projected as `hex()` so the compare is
    * byte-exact without blob stringification hazards.
    */
  private def exoticTable(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val dir = Paths.get(fixDir(sfDir, "various_types_sql"))
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("vt.exotic.0001.sql"),
      """INSERT INTO exotic VALUES
        |(1, x'EE72ae0aef354c5d', b'10100101', 12.3456,
        | '{"a": 1, "b": ["x", "y"]}', '2021-03-04 05:06:07.000123',
        | '2021-03-04 05:06:07.89', 2.5, 18446744073709551615, 'héllo', 1999),
        |(2, 0xDEADBEEF, b'1', -9.9999, '[]', '1970-01-02 00:00:00',
        | '2000-02-29 12:00:00.001', -0.125, 0, '', 2024),
        |(3, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL);
        |""".stripMargin)
    val schema = MysqlDdl.parse(
      """CREATE TABLE exotic (
        |  id int NOT NULL,
        |  bin varbinary(16),
        |  bits bit(8),
        |  dec6 decimal(6,4),
        |  js json,
        |  dt datetime(6),
        |  ts3 timestamp(3),
        |  dbl double,
        |  big bigint UNSIGNED,
        |  s varchar(20),
        |  yr year,
        |  PRIMARY KEY (id)
        |);""".stripMargin)
    DumpSource.read(spark, Seq(dir.toString), schema)
  }

  def variousTypes(spark: SparkSession, sfDir: String): DataFrame =
    exoticTable(spark, sfDir)
      .select(col("id"), hex(col("bin")).as("bin_hex"), col("bits"),
        col("dec6").cast("string").as("dec6_str"), col("js"), col("dt"),
        col("ts3"), col("dbl"), col("big").cast("string").as("big_str"),
        col("s"), col("yr"))
      .orderBy("id")

  def variousTypesSql: String =
    """SELECT * FROM (VALUES
      |  (1, 'EE72AE0AEF354C5D', CAST(165 AS BIGINT),
      |   '12.3456', '{"a": 1, "b": ["x", "y"]}',
      |   TIMESTAMP '2021-03-04 05:06:07.000123',
      |   TIMESTAMP '2021-03-04 05:06:07.89', CAST(2.5 AS DOUBLE),
      |   '18446744073709551615', 'héllo', 1999),
      |  (2, 'DEADBEEF', CAST(1 AS BIGINT), '-9.9999',
      |   '[]', TIMESTAMP '1970-01-02 00:00:00',
      |   TIMESTAMP '2000-02-29 12:00:00.001', CAST(-0.125 AS DOUBLE),
      |   '0', '', 2024),
      |  (3, CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
      |   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
      |   CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
      |   CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
      |   CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER))
      |) AS t(id, bin_hex, bits, dec6_str, js, dt, ts3, dbl, big_str, s, yr)
      |ORDER BY id""".stripMargin

  /** Typed-DECIMAL semantics probe. History: r04 shipped dec6/big as raw
    * typed columns and the driver's hash red-flagged them even though
    * both sides were bit-identical under independent DuckDB comparison
    * (rows_match and schema_match stayed true in r05 — only hash_match
    * was false). Conclusion, now pinned by two rounds of evidence: the
    * driver's own collection path canonicalizes typed DECIMAL cells
    * differently from DuckDB's (r03's HUGEINT precedent), so typed
    * DECIMAL must never appear in a driver-compared output column.
    *
    * This probe therefore runs the decimal ARITHMETIC typed inside
    * Spark — multiply, subtract at the uint64 ceiling, round-on-cast,
    * and a SUM aggregate — and renders each result as an exact string
    * for the compare. Every arithmetic result is explicitly CAST to a
    * fixed DECIMAL(p,s) on BOTH sides before stringifying, because the
    * engines' implicit result-type rules differ (Spark p1+p2+1 vs
    * DuckDB's width rules) while an explicit cast pins scale and hence
    * the rendered digits. The narrowing cast differs too — Spark's
    * decimal→decimal cast rounds HALF_UP where DuckDB's truncates — so
    * the oracle spells Spark's semantics out as `round(dec6, 2)` before
    * its cast. No value sits on a .5 rounding tie, so
    * HALF_UP-vs-away-from-zero differences can't bite. The typed leg
    * (DecimalType(6,4)/(20,0) schema out of the dump parser) is pinned
    * by `DumpSourceSpec`.
    */
  def variousTypesDec(spark: SparkSession, sfDir: String): DataFrame = {
    // cached: both the per-row select and the totals agg read it, and an
    // uncached plan would re-run the fixture write + dump parse twice
    val t = exoticTable(spark, sfDir).cache()
    val totals = t.agg(
      sum(col("dec6")).cast("decimal(12,4)").cast("string").as("dec6_sum"),
      sum(col("big")).cast("decimal(21,0)").cast("string").as("big_sum"))
    t.select(
        col("id"),
        col("dec6").cast("string").as("dec6_str"),
        (col("dec6") * lit(3)).cast("decimal(8,4)").cast("string").as("dec6_x3"),
        col("dec6").cast("decimal(5,2)").cast("string").as("dec6_r2"),
        col("big").cast("string").as("big_str"),
        (col("big") - lit(1)).cast("decimal(21,0)").cast("string").as("big_minus1"))
      .crossJoin(totals)
      .orderBy("id")
  }

  def variousTypesDecSql: String =
    """WITH t(id, dec6, big) AS (VALUES
      |  (1, CAST(12.3456 AS DECIMAL(6,4)),
      |   CAST('18446744073709551615' AS DECIMAL(20,0))),
      |  (2, CAST(-9.9999 AS DECIMAL(6,4)), CAST(0 AS DECIMAL(20,0))),
      |  (3, CAST(NULL AS DECIMAL(6,4)), CAST(NULL AS DECIMAL(20,0)))),
      |tot AS (SELECT
      |  CAST(CAST(sum(dec6) AS DECIMAL(12,4)) AS VARCHAR) AS dec6_sum,
      |  CAST(CAST(sum(big) AS DECIMAL(21,0)) AS VARCHAR) AS big_sum
      |  FROM t)
      |SELECT id,
      |  CAST(dec6 AS VARCHAR) AS dec6_str,
      |  CAST(CAST(dec6 * 3 AS DECIMAL(8,4)) AS VARCHAR) AS dec6_x3,
      |  CAST(CAST(round(dec6, 2) AS DECIMAL(5,2)) AS VARCHAR) AS dec6_r2,
      |  CAST(big AS VARCHAR) AS big_str,
      |  CAST(CAST(big - 1 AS DECIMAL(21,0)) AS VARCHAR) AS big_minus1,
      |  dec6_sum, big_sum
      |FROM t, tot ORDER BY id""".stripMargin

  // ------------------------------------------------------------ S5/T9/E4
  private val supplierDdl =
    """CREATE TABLE supplier (
      |  s_suppkey bigint NOT NULL,
      |  s_name varchar(25),
      |  s_nationkey int,
      |  s_acctbal double,
      |  PRIMARY KEY (s_suppkey)
      |);""".stripMargin

  /** INSERT-dump round trip (S5 parser + E4/T9 emitter): table →
    * `INSERT INTO … VALUES (…),(…);` files → dump parser → DDL casts.
    */
  def dumpRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = fixDir(sfDir, "supplier_sql")
    val schema = MysqlDdl.parse(supplierDdl)
    InsertDumpWriter.write(table(spark, sfDir, "supplier"), "supplier", dir,
      rowsPerStatement = 7)
    DumpSource.read(spark, Seq(dir), schema).orderBy("s_suppkey")
  }

  def dumpRoundtripSql: String =
    "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey"

  // ------------------------------------------------------------ D1/D2
  /** Range-partitioned sorted bulk write + read-back (D1/D2/D4/D5):
    * the Spark equivalent of the reference's external-sort + SST
    * ingest. The read-back aggregation must match the pre-write table.
    */
  def sortedWrite(spark: SparkSession, sfDir: String): DataFrame = {
    val out = fixDir(sfDir, "lineitem_sorted")
    SortedParquetSink.write(table(spark, sfDir, "lineitem"), out,
      Seq("l_orderkey", "l_linenumber"), numRanges = 8)
    spark.read.parquet(out)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"), sum(quant("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  def sortedWriteSql: String =
    """SELECT l_returnflag, count(*) AS n_rows,
      |  CAST(sum(CAST(floor(l_quantity*10000) AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Z-order clustered layout (D1/D2 generalized to two dimensions):
    * range-partition + sort the bulk write on the Morton interleave of
    * (p_partkey, p_size) so parquet min/max stats and range-file bounds
    * prune selective predicates on EITHER column — a lexicographic
    * (p_partkey, p_size) sort clusters only the leading key. The key is
    * the codegen'd [[graft.functions.ZOrder2]] expression; the oracle
    * reproduces the interleave with the same mask-shift cascade in SQL,
    * so the values are pinned bit-exact, and the read-back proves the
    * layout round-trips.
    */
  def zorderLayout(spark: SparkSession, sfDir: String): DataFrame = {
    val out = fixDir(sfDir, "part_zorder")
    val dfz = table(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_size"))
      .withColumn("z",
        graft.functions.ZOrder2.zorder2(col("p_partkey"), col("p_size")))
    SortedParquetSink.write(dfz, out, Seq("z"), numRanges = 8)
    spark.read.parquet(out).orderBy("p_partkey")
  }

  def zorderLayoutSql: String =
    """WITH s0 AS (SELECT p_partkey, p_size,
      |    CAST(p_partkey AS BIGINT) & 4294967295 AS xa,
      |    CAST(p_size AS BIGINT) & 4294967295 AS xb
      |  FROM part),
      |s1 AS (SELECT p_partkey, p_size,
      |    (xa | (xa << 16)) & 281470681808895 AS xa,
      |    (xb | (xb << 16)) & 281470681808895 AS xb FROM s0),
      |s2 AS (SELECT p_partkey, p_size,
      |    (xa | (xa << 8)) & 71777214294589695 AS xa,
      |    (xb | (xb << 8)) & 71777214294589695 AS xb FROM s1),
      |s3 AS (SELECT p_partkey, p_size,
      |    (xa | (xa << 4)) & 1085102592571150095 AS xa,
      |    (xb | (xb << 4)) & 1085102592571150095 AS xb FROM s2),
      |s4 AS (SELECT p_partkey, p_size,
      |    (xa | (xa << 2)) & 3689348814741910323 AS xa,
      |    (xb | (xb << 2)) & 3689348814741910323 AS xb FROM s3),
      |s5 AS (SELECT p_partkey, p_size,
      |    (xa | (xa << 1)) & 6148914691236517205 AS xa,
      |    (xb | (xb << 1)) & 6148914691236517205 AS xb FROM s4)
      |SELECT p_partkey, p_size, CAST(xa | (xb << 1) AS BIGINT) AS z
      |FROM s5 ORDER BY p_partkey""".stripMargin

  // ------------------------------------------------------------ A3/A5
  /** End-to-end checksum verification (A3/A5): CRC64-XOR before the
    * bulk write vs over the read-back output. `is_match` flips to false
    * on any corruption, which the oracle hash-compare then catches.
    */
  def checksumRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val out = fixDir(sfDir, "orders_checksum")
    val src = table(spark, sfDir, "orders")
    // Pre-write checksum rides the write pass as an observed metric
    // (attached above the range shuffle — see writeObserved): one scan
    // of the source plus the read-back scan, instead of three passes.
    val obs = org.apache.spark.sql.Observation()
    SortedParquetSink.writeObserved(src, out, Seq("o_orderkey"), obs,
      Checksum.checksumCol, numRanges = 4)
    val pre = Checksum.fromMetric(obs.get("kv_checksum"))
    val post = {
      val r = Checksum.tableChecksum(spark.read.parquet(out)).collect()(0)
      graft.verify.KvChecksum(r.getLong(0), r.getLong(1), r.getLong(2))
    }
    import spark.implicits._
    Seq((pre.totalKvs, Checksum.matches(pre, post)))
      .toDF("total_kvs", "is_match")
  }

  def checksumRoundtripSql: String =
    "SELECT count(*) AS total_kvs, TRUE AS is_match FROM orders"

  // ------------------------------------------------------------ D6
  /** Compaction (D6): a fragmented import (16 range files) rewrites to
    * 2 larger files; content must be byte-for-byte equivalent
    * (count/sum probes) and the file count must actually shrink.
    */
  def compactOutput(spark: SparkSession, sfDir: String): DataFrame = {
    val out = fixDir(sfDir, "supplier_compact")
    SortedParquetSink.write(table(spark, sfDir, "supplier"), out,
      Seq("s_suppkey"), numRanges = 16)
    val (before, after) = graft.pipeline.Compaction.compact(spark, out, 2)
    spark.read.parquet(out)
      .agg(count(lit(1)).as("n_rows"), sum(quant("s_acctbal")).as("sum_bal"))
      .select(col("n_rows"), col("sum_bal"),
        lit(before > after && after <= 2).as("compacted"))
  }

  def compactOutputSql: String =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(CAST(floor(s_acctbal*10000) AS BIGINT)) AS BIGINT) AS sum_bal,
      |  count(*) > 0 AS compacted
      |FROM supplier""".stripMargin

  // ------------------------------------------------------------ A7
  /** ANALYZE (A7): bulk-write `part`, register it in the catalog,
    * `ANALYZE TABLE … COMPUTE STATISTICS`, and report the row count the
    * catalog recorded — the stats every later CBO decision (join
    * reorder, broadcast selection) reads.
    */
  def analyzeStats(spark: SparkSession, sfDir: String): DataFrame = {
    val out = fixDir(sfDir, "part_analyze")
    SortedParquetSink.write(table(spark, sfDir, "part"), out, Seq("p_partkey"))
    val n = graft.pipeline.Analyze.analyze(spark, "part_analyze", out)
    import spark.implicits._
    Seq(("part", n.getOrElse(-1L))).toDF("table_name", "stat_rows")
  }

  def analyzeStatsSql: String =
    "SELECT 'part' AS table_name, count(*) AS stat_rows FROM part"

  // ------------------------------------------------------------ E4
  /** On-duplicate policy (E4): duplicated input deduped with "ignore"
    * (first wins) collapses back to the original table.
    */
  def dedupPolicy(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = table(spark, sfDir, "orders")
    // r18: both copies out of ONE scan (guide §2.4) — a 2-element
    // explode replaces the self-union's second scan; same row multiset
    val cols = orders.columns.toSeq
    val doubled = orders
      .select(explode(array(struct(cols.map(col): _*),
        struct(cols.map(col): _*))).as("v"))
      .select(cols.map(c => col(s"v.$c").as(c)): _*)
    SortedParquetSink.dedup(doubled, Seq("o_orderkey"), "ignore")
      .agg(count(lit(1)).as("n_rows"), sum(quant("o_totalprice")).as("sum_price"))
  }

  def dedupPolicySql: String =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(CAST(floor(o_totalprice*10000) AS BIGINT)) AS BIGINT) AS sum_price
      |FROM orders""".stripMargin

  /** On-duplicate "error" policy (E4), happy path: a key-unique input
    * passes through the uniqueness assertion untouched (the failure
    * path — a planted duplicate raising — is spec-covered in
    * DedupErrorSpec; an erroring query can't be oracle-checked).
    */
  def dedupError(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = table(spark, sfDir, "orders")
    SortedParquetSink.dedup(orders, Seq("o_orderkey"), "error")
      .agg(count(lit(1)).as("n_rows"), sum(quant("o_totalprice")).as("sum_price"))
  }

  def dedupErrorSql: String =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(CAST(floor(o_totalprice*10000) AS BIGINT)) AS BIGINT) AS sum_price
      |FROM orders""".stripMargin

  /** Duplicate-key conflict report (E4's non-throwing face): plant
    * duplicates by re-unioning the low keys of `nation`, report each
    * conflicting key with its multiplicity.
    */
  def dedupConflicts(spark: SparkSession, sfDir: String): DataFrame = {
    val nation = table(spark, sfDir, "nation")
    val planted = nation.unionByName(nation.filter(col("n_nationkey") < 3))
    SortedParquetSink.conflicts(planted, Seq("n_nationkey"))
      .orderBy("n_nationkey")
  }

  def dedupConflictsSql: String =
    """SELECT n_nationkey, count(*) AS n_rows
      |FROM (SELECT n_nationkey FROM nation
      |      UNION ALL SELECT n_nationkey FROM nation WHERE n_nationkey < 3)
      |GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin
}
