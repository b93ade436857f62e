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

  test("quantDot is exact integer math") {
    import spark.implicits._
    val df = Seq((Seq(1.5f, -0.25f), Seq(2.0f, 4.0f))).toDF("a", "b")
    val got = df.select(quantDot(col("a"), col("b")).as("d")).collect()(0).getLong(0)
    // floor(1.5e6)*floor(2e6) + floor(-0.25e6)*floor(4e6)
    assert(got === 1500000L * 2000000L + -250000L * 4000000L)
  }
}
