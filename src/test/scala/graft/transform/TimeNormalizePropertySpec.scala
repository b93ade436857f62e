package graft.transform

import graft.SparkSpec

/** Property-style pin of the TIME storage normalization against an
  * independent plain-Scala model (the LenientCastPropertySpec
  * discipline): generated colon shapes — valid, out-of-range, junk —
  * must agree with the model in every cast policy, since MySQL's TIME
  * normalization is sql-mode-independent. Seeded generator — failures
  * reproduce.
  */
class TimeNormalizePropertySpec extends SparkSpec {

  /** The model: `[-][D ]H:M[:S][.frac]` with minutes/seconds 0–59 and
    * folded hours ≤ 838 canonicalizes to `[-]HH:MM:SS[.frac]`;
    * anything else — junk, out-of-range fields, numeric forms — passes
    * through lexically.
    */
  private val Shape =
    """^\s*(-)?(?:(\d{1,2}) )?(\d{1,3}):([0-5]?\d)(?::([0-5]?\d))?(\.\d+)?\s*$""".r

  private def model(s: String): String = s match {
    case Shape(sign, days, h, m, sec, frac) =>
      val hours = Option(days).map(_.toInt).getOrElse(0) * 24 + h.toInt
      if (hours > 838) s
      else f"${Option(sign).getOrElse("")}$hours%02d:${m.toInt}%02d:" +
        f"${Option(sec).map(_.toInt).getOrElse(0)}%02d${Option(frac).getOrElse("")}"
    case _ => s
  }

  test("generated colon shapes agree with the model in every policy") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    def gen(): String = rnd.nextInt(8) match {
      case 0 => s"${rnd.nextInt(999)}:${rnd.nextInt(100)}:${rnd.nextInt(100)}"
      case 1 => s"${rnd.nextInt(24)}:${rnd.nextInt(60)}"
      case 2 => s"${rnd.nextInt(35)} ${rnd.nextInt(24)}:${rnd.nextInt(60)}:${rnd.nextInt(60)}"
      case 3 => s"-${rnd.nextInt(840)}:${rnd.nextInt(60)}:${rnd.nextInt(60)}"
      case 4 => s"${rnd.nextInt(24)}:${rnd.nextInt(60)}:${rnd.nextInt(60)}" +
        s".${rnd.nextInt(1000000)}"
      case 5 => rnd.nextInt(240000).toString // MySQL numeric TIME: lexical here
      case 6 => s" ${rnd.nextInt(24)}:${rnd.nextInt(60)}:${rnd.nextInt(60)} "
      case _ => Seq("junk", "::", "1:2:3:4", "12-34-56", "")(rnd.nextInt(5))
    }
    val inputs = Seq.fill(400)(gen()).distinct
    val schema = graft.schema.MysqlDdl.parse("CREATE TABLE t (id int, v time)")
    val df = inputs.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "v")
    for (p <- Seq(RowTransform.CastPolicy.NullOut,
        RowTransform.CastPolicy.Lenient, RowTransform.CastPolicy.Strict)) {
      val out = RowTransform.applySchema(df, schema, p)
        .orderBy("id").collect().map(_.getString(1))
      inputs.zip(out).foreach { case (in, got) =>
        assert(got === model(in), s"policy=$p input='$in'")
      }
    }
  }
}
