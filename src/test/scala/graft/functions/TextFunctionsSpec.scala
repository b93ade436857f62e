package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {

  test("tokens: empty and whitespace-only text produce empty arrays") {
    import spark.implicits._
    val out = Seq("", "   ", "a  b\tc").toDF("t")
      .select(size(tokens(col("t"))).as("n")).collect().map(_.getInt(0))
    assert(out.toSeq === Seq(0, 0, 3))
  }

  test("shingles: count and content") {
    import spark.implicits._
    val out = Seq("a b c d e f").toDF("t")
      .select(shingles(tokens(col("t")), 5).as("s"))
      .collect()(0).getSeq[String](0)
    assert(out === Seq("a b c d e", "b c d e f"))
    val short = Seq("a b").toDF("t")
      .select(size(shingles(tokens(col("t")), 5)).as("n")).collect()(0).getInt(0)
    assert(short === 0)
  }

  test("md5Long executor expression equals the driver-side twin") {
    import spark.implicits._
    val inputs = Seq("hello", "0,63", "x:12345", "")
    val fromSpark = inputs.toDF("s").select(md5Long(col("s")).as("h"))
      .collect().map(_.getLong(0))
    assert(fromSpark.toSeq === inputs.map(md5LongLocal))
  }

  test("md5Long codegen kernel equals the hex-string composition and handles nulls") {
    import spark.implicits._
    val inputs: Seq[String] = Seq("hello", "", "émoji ✨", "a b c", null)
    val rows = inputs.toDF("s")
      .select(md5Long(col("s")).as("fast"), md5LongComposed(col("s")).as("slow"))
      .collect()
    rows.foreach { r => assert(Option(r.get(0)) === Option(r.get(1))) }
    assert(rows.last.isNullAt(0))
  }

  test("quantDot is exact integer math") {
    import spark.implicits._
    val df = Seq((Seq(1.5f, -0.25f), Seq(2.0f, 4.0f))).toDF("a", "b")
    val got = df.select(quantDot(col("a"), col("b")).as("d")).collect()(0).getLong(0)
    // floor(1.5e6)*floor(2e6) + floor(-0.25e6)*floor(4e6)
    assert(got === 1500000L * 2000000L + -250000L * 4000000L)
  }

  test("quantDot codegen expression matches the composed twin, incl. null/edge cases") {
    import spark.implicits._
    val rows = Seq(
      (Seq[java.lang.Float](1.5f, -0.25f, 0.007f), Seq[java.lang.Float](2.0f, 4.0f, -1.25f)),
      (Seq[java.lang.Float](), Seq[java.lang.Float]()), // empty → 0
      (Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](2.0f, 3.0f)), // null elem → null
      (Seq[java.lang.Float](1.0f), Seq[java.lang.Float](2.0f, 3.0f)), // length mismatch → null
      (null, Seq[java.lang.Float](1.0f)) // null array → null
    )
    val df = rows.toDF("a", "b")
    val got = df.select(
      quantDot(col("a"), col("b")).as("fast"),
      quantDotComposed(col("a"), col("b")).as("slow")).collect()
    got.foreach { r =>
      assert(Option(r.get(0)) === Option(r.get(1)), s"mismatch on row $r")
    }
    assert(got(0).getLong(0) ===
      1500000L * 2000000L + -250000L * 4000000L + 7000L * -1250000L)
    assert(got(1).getLong(0) === 0L)
    assert(got(2).isNullAt(0) && got(3).isNullAt(0) && got(4).isNullAt(0))
  }

  test("quantDot with non-nullable literal children still yields NULL on length mismatch") {
    // array(...) literals are non-nullable — without the nullable
    // override this declared the expression non-null, broke codegen
    // compilation, and could fold IsNull(...) to false
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    graft.GraftExtensions.functions.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
    val got = spark.sql(
      "SELECT quant_dot(array(CAST(1.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d")
      .collect()(0)
    assert(got.isNullAt(0))
  }

  test("quantDot mixes float and long arrays (LSH plane literals)") {
    import spark.implicits._
    val df = Seq((Seq(0.5f, -1.0f), Seq(3L, 7L))).toDF("a", "b")
    val got = df.select(
      quantDot(col("a"), col("b")).as("fast"),
      quantDotComposed(col("a"), col("b")).as("slow")).collect()(0)
    assert(got.getLong(0) === got.getLong(1))
    assert(got.getLong(0) === 500000L * 3000000L + -1000000L * 7000000L)
  }
}
