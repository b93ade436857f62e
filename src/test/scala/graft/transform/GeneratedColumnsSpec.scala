package graft.transform

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MySQL → Catalyst translation rules for generated-column expressions,
  * focused on the spellings with no literal Spark twin.
  */
class GeneratedColumnsSpec extends SparkSpec {

  test("format tokens convert to Catalyst pattern letters") {
    assert(GeneratedColumns.convertFormat("%Y-%m-%d %H:%i:%s") === "yyyy-MM-dd HH:mm:ss")
    assert(GeneratedColumns.convertFormat("%W") === "EEEE")
    assert(GeneratedColumns.convertFormat("%d/%c/%y") === "dd/M/yy")
    // literal alphabetics are quoted so they can't collide with
    // pattern letters; %% is a literal percent
    assert(GeneratedColumns.convertFormat("%YT%m%%") === "yyyy'T'MM%")
    intercept[IllegalArgumentException](GeneratedColumns.convertFormat("%Q"))
  }

  test("splitArgs honors nesting and quoted commas") {
    assert(GeneratedColumns.splitArgs("a, f(b, c), 'x,y'") ===
      Seq("a", " f(b, c)", " 'x,y'"))
  }

  test("translate rewrites the MySQL-only spellings") {
    assert(GeneratedColumns.translate("ucase(s)") === "upper(s)")
    assert(GeneratedColumns.translate("mid(s, 2, 3)") === "substring(s, 2, 3)")
    assert(GeneratedColumns.translate("oct(n)") === "conv((n), 10, 8)")
    assert(GeneratedColumns.translate("to_days(d)") ===
      "(datediff((d), date'0001-01-01') + 366)")
    assert(GeneratedColumns.translate("truncate(x, 2)") ===
      "(sign(x) * floor(abs(x) * pow(10, 2)) / pow(10, 2))")
    assert(GeneratedColumns.translate("date_format(d, '%Y-%m')") ===
      "date_format(d, 'yyyy-MM')")
    assert(GeneratedColumns.translate("str_to_date(s, '%Y-%m-%d')") ===
      "to_timestamp(s, 'yyyy-MM-dd')")
  }

  test("ECB modes drop the IV at translate time; CBC passes it through") {
    // MySQL IGNORES init_vector under ECB (warning only) — even a NULL
    // iv must not null the ciphertext, so ECB never lets the user iv
    // reach the expression's null-intolerant eval
    val ecb = GeneratedColumns.SessionVars(blockEncryptionMode = "aes-128-ecb")
    assert(GeneratedColumns.translate("aes_encrypt(v, 'k', iv)", ecb) ===
      "mysql_aes_encrypt(cast((v) as string), 'k', 'aes-128-ecb', X'')")
    val cbc = GeneratedColumns.SessionVars(blockEncryptionMode = "aes-256-cbc")
    assert(GeneratedColumns.translate("aes_decrypt(v, 'k', iv)", cbc) ===
      "mysql_aes_decrypt(v, 'k', 'aes-256-cbc', iv)")
    // e2e: NULL iv under ECB still encrypts (MySQL parity)
    import spark.implicits._
    val out = Seq(("secret", null: Array[Byte])).toDF("v", "iv")
      .select(GeneratedColumns.column("aes_encrypt(v, 'k', iv)", ecb).as("c"))
      .head()
    assert(out.getAs[Array[Byte]](0) != null && out.getAs[Array[Byte]](0).nonEmpty)
  }

  test("raw SQL mysql_aes_encrypt with NULL iv: ciphertext under ECB, NULL under CBC") {
    // the translate-time IV drop only protects the gencol path; the
    // SQL-registered function must ignore a NULL iv under ECB itself
    // (MySQL parity) — the expression's eval/codegen carve-out
    val r = spark.sql(
      """SELECT mysql_aes_encrypt('secret', 'k', 'aes-128-ecb', NULL) AS e,
        |       mysql_aes_encrypt('secret', 'k', 'aes-256-cbc', NULL) AS c""".stripMargin)
      .head()
    val ecbCipher = r.getAs[Array[Byte]]("e")
    assert(ecbCipher != null && ecbCipher.nonEmpty,
      "ECB ignores the IV — a NULL iv must still encrypt")
    assert(r.isNullAt(r.fieldIndex("c")),
      "CBC requires an IV — NULL iv propagates NULL")
    // the NULL-iv ECB ciphertext matches the explicit-iv call (iv unused)
    val same = spark.sql(
      "SELECT mysql_aes_encrypt('secret', 'k', 'aes-128-ecb', X'') AS e").head()
    assert(java.util.Arrays.equals(ecbCipher, same.getAs[Array[Byte]]("e")))
    // and decrypt round-trips through the same NULL-iv carve-out
    val back = spark.sql(
      "SELECT CAST(mysql_aes_decrypt(mysql_aes_encrypt('secret', 'k', " +
        "'aes-192-ecb', NULL), 'k', 'aes-192-ecb', NULL) AS STRING) AS v").head()
    assert(back.getString(0) === "secret")
  }

  test("2-arg from_unixtime under a pinned time_zone shifts AND converts the format") {
    val tz = GeneratedColumns.SessionVars(timeZone = "-08:00")
    assert(GeneratedColumns.translate("from_unixtime(1, '%Y-%m-%d')", tz) ===
      "date_format(from_utc_timestamp(timestamp_seconds(1), '-08:00'), " +
        "'yyyy-MM-dd')")
    import spark.implicits._
    val out = Seq(Tuple1(1L)).toDF("t")
      .select(GeneratedColumns.column("from_unixtime(t, '%Y-%m-%d %H')", tz).as("v"))
      .head()
    assert(out.getString(0) === "1969-12-31 16")
    // a non-literal format cannot be silently rendered in the wrong
    // zone — loud, the str_to_date convention
    val e = intercept[IllegalArgumentException] {
      GeneratedColumns.translate("from_unixtime(t, fmt_col)", tz)
    }
    assert(e.getMessage.contains("non-literal"))
  }

  test("literal letters in formats survive both quoting layers") {
    // 'T' is quoted at the pattern layer AND escaped for the SQL
    // string literal — the naive embedding would terminate the literal
    assert(GeneratedColumns.translate("date_format(d, '%YT%H')") ===
      "date_format(d, 'yyyy\\'T\\'HH')")
    import spark.implicits._
    val out = Seq("2024-03-05 07:08:09").toDF("ts")
      .withColumn("d", col("ts").cast("timestamp"))
      .select(GeneratedColumns.column("date_format(d, '%YT%Hh%im')").as("v"))
      .head()
    assert(out.getString(0) === "2024T07h08m")
  }

  test("translated expressions evaluate with MySQL semantics") {
    import spark.implicits._
    val df = Seq(("2024-03-05 07:08:09", 123.456, -9.99, 64L))
      .toDF("ts", "x", "neg", "n")
      .withColumn("d", col("ts").cast("timestamp"))
    val out = df.select(
      GeneratedColumns.column("date_format(d, '%W')").as("w"),
      GeneratedColumns.column("to_days(d)").as("nd"),
      GeneratedColumns.column("truncate(x, 1)").as("t1"),
      GeneratedColumns.column("truncate(neg, 1)").as("tn"),
      GeneratedColumns.column("oct(n)").as("o")).head()
    assert(out.getString(0) === "Tuesday")
    // MySQL: SELECT TO_DAYS('2024-03-05') = 739315
    assert(out.getInt(1) === 739315)
    assert(out.getDouble(2) === 123.4)
    assert(out.getDouble(3) === -9.9) // truncate is toward zero, not floor
    assert(out.getString(4) === "100")
  }
}
