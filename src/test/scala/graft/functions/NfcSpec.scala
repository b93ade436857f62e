package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.NfcNormalize.nfcNormalize

/** The NFC expression against java.text.Normalizer ground truth:
  * composition, idempotence, the already-normalized fast path, nulls,
  * and a Hangul/combining torture set evaluated through a real Spark
  * plan (codegen path).
  */
class NfcSpec extends SparkSpec {

  private val samples = Seq(
    "Café",                 // e + combining acute → é
    "Café",                       // already composed
    "각",         // Hangul jamo → 각 (syllable)
    "à̖",              // multiple combining marks reorder
    "plain ascii",
    "",
    "ﬁ ligature ﬁ")          // compatibility chars NFC must KEEP

  test("matches java.text.Normalizer through a Spark plan") {
    import spark.implicits._
    val out = samples.toDF("s").select(nfcNormalize(col("s"))).collect()
      .map(_.getString(0))
    val want = samples.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(out.toSeq === want)
    // NFC (not NFKC): the ligature survives
    assert(out.last.contains("ﬁ"))
  }

  test("composed and decomposed renderings hash identically after NFC") {
    import spark.implicits._
    val out = Seq(("Café", "Café")).toDF("a", "b")
      .select(md5(nfcNormalize(col("a")).cast("binary")).as("ha"),
        md5(nfcNormalize(col("b")).cast("binary")).as("hb"))
      .collect()(0)
    assert(out.getString(0) === out.getString(1))
  }

  test("idempotent and null-transparent") {
    import spark.implicits._
    val once = Seq("Café").toDF("s").select(nfcNormalize(col("s")))
      .collect()(0).getString(0)
    val twice = Seq("Café").toDF("s")
      .select(nfcNormalize(nfcNormalize(col("s")))).collect()(0).getString(0)
    assert(once === twice)
    val n = Seq[Option[String]](None).toDF("s").select(nfcNormalize(col("s")))
      .collect()(0)
    assert(n.isNullAt(0))
  }
}
