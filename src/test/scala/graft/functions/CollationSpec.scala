package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sink.SortedParquetSink

/** Collation-normalized keys drive the standard dedup machinery
  * (reference `tests/new_collation`: under utf8mb4_general_ci the
  * import must treat case-flipped / trailing-spaced keys as the same
  * unique key).
  */
class CollationSpec extends SparkSpec {

  private def variants = {
    import spark.implicits._
    Seq(("Abc", 1), ("ABC  ", 2), ("abc", 3), ("xyz", 4))
      .toDF("k", "v")
      .withColumn("ci_key", Collation.generalCiKey(col("k")))
  }

  test("general_ci key folds case and trailing spaces") {
    val keys = variants.select("ci_key").collect().map(_.getString(0)).toSeq
    assert(keys === Seq("abc", "abc", "abc", "xyz"))
  }

  test("ignore policy keeps first per collation key") {
    val kept = SortedParquetSink.dedup(variants, Seq("ci_key"), "ignore", Some("v"))
      .select("k", "v").collect().map(r => (r.getString(0), r.getInt(1))).sortBy(_._2)
    assert(kept.toSeq === Seq(("Abc", 1), ("xyz", 4)))
  }

  test("error policy fails on a collation-only duplicate") {
    val e = intercept[Exception] {
      SortedParquetSink.dedup(variants, Seq("ci_key"), "error").collect()
    }
    assert(e.getMessage.contains("duplicate key"))
  }

  test("bin PAD SPACE key ignores trailing spaces but not case") {
    import spark.implicits._
    val df = Seq("a", "a ", "A").toDF("k")
      .select(Collation.binPadKey(col("k")).as("p"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("a", "a", "A"))
  }
}
