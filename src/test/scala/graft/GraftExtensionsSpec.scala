package graft

import org.apache.spark.sql.SparkSessionExtensions

class GraftExtensionsSpec extends SparkSpec {

  test("crc64 registers as a SQL function") {
    // the extension applies cleanly
    new GraftExtensions().apply(new SparkSessionExtensions)
    // same registration against the live session's registry (a
    // dedicated .withExtensions session would need its own
    // SparkContext; registry injection exercises the identical triple)
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
    val got = spark.sql("SELECT crc64(CAST('123456789' AS BINARY)) AS c")
      .collect()(0).getLong(0)
    assert(got === 0x995DC9BBDF1939FAL) // CRC-64/XZ check vector
    // SQL and DataFrame paths are the same expression
    val viaApi = spark.range(1)
      .select(graft.functions.Crc64Expr.crc64(
        org.apache.spark.sql.functions.lit("123456789".getBytes("UTF-8"))))
      .collect()(0).getLong(0)
    assert(viaApi === got)
  }

  test("quant_dot registers as a SQL function and matches the DataFrame path") {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
    val got = spark.sql(
      "SELECT quant_dot(array(CAST(1.5 AS FLOAT), CAST(-0.25 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect()(0).getLong(0)
    assert(got === 1500000L * 2000000L + -250000L * 4000000L)
  }
}
