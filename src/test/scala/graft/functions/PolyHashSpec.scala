package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The polynomial gram-hash kernel: Spark expression vs the
  * driver-side twin, codegen path, and the edge shapes (below-k,
  * empty, null, unicode) the winnow family leans on.
  */
class PolyHashSpec extends SparkSpec {

  private def viaSpark(texts: Seq[String], k: Int): Seq[Seq[Long]] = {
    import spark.implicits._
    texts.toDF("text")
      .select(PolyGramHash.polyGramHash(
        graft.functions.TextFunctions.tokens(col("text")), k).as("h"))
      .collect().map(_.getSeq[Long](0)).toSeq
  }

  private def viaLocal(text: String, k: Int): Seq[Long] = {
    val t = text.trim
    if (t.isEmpty) return Seq.empty
    t.split("\\s+").toSeq.sliding(k).filter(_.length == k)
      .map(PolyHash.gramLocal).toSeq
  }

  test("expression matches the driver-side twin on varied shapes") {
    val texts = Seq(
      "alpha beta gamma delta epsilon",
      "a b c d",          // exactly k tokens → one gram
      "one two three",    // below k → empty
      "solo", "", "   ",
      "x " * 50,          // heavy repetition → equal grams
      "Ünïcödé tökens résumé naïve façade mixed ascii")
    val got = viaSpark(texts, 4)
    texts.zip(got).foreach { case (t, g) =>
      assert(g === viaLocal(t, 4), s"text: '$t'")
    }
  }

  test("null token arrays hash to null, not a crash") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("text")
      .select(PolyGramHash.polyGramHash(split(col("text"), " "), 4).as("h"))
      .collect()
    assert(r.head.isNullAt(0))
  }

  test("fingerprints stay in [0, 2^61): safe for BIGINT math both engines") {
    val fps = viaSpark(Seq("the quick brown fox jumps over the lazy dog " * 20), 4).flatten
    assert(fps.nonEmpty)
    fps.foreach(f => assert(f >= 0 && f < (1L << 61)))
  }

  test("equal grams hash equal across documents (the winnowing guarantee's input)") {
    val shared = "alpha beta gamma delta"
    val a = viaSpark(Seq(s"prefix words here $shared"), 4).head.toSet
    val b = viaSpark(Seq(s"$shared other suffix content"), 4).head.toSet
    assert(a.intersect(b).contains(PolyHash.gramLocal(shared.split(" ").toSeq)))
  }

  test("codegen and interpreted paths agree") {
    // the kernel call IS the interpreted path; the DataFrame run goes
    // through whole-stage codegen — both must produce the same longs
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val toks = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
    val interpreted = PolyHash.gramHashes(arr, 4)
    val viaDf = viaSpark(Seq(toks.mkString(" ")), 4).head
    assert(interpreted.toLongArray().toSeq === viaDf)
  }
}
