package graft.transform

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style pin of the MySQL-lenient cast kernel against an
  * independent plain-Scala model (the Bm25Spec replay discipline: a
  * second implementation path, so a bug in the column-expression
  * plumbing can't self-confirm). Seeded generator — failures
  * reproduce. Covers the branches `tests/sqlmode`'s five rows can't
  * sweep: the whole clamp range, rounding parity, prefix parsing, and
  * SET member/dup/bitmask combinations.
  */
class LenientCastPropertySpec extends SparkSpec {

  private val PrefixRe =
    "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?".r

  /** numericPrefix's model: regex prefix of the trimmed value, carried
    * at decimal(38,6) — the cast ROUNDS to 6 fractional digits
    * half-up, and an integer part past 32 digits overflows to None.
    */
  private def prefix(s: String): Option[BigDecimal] =
    PrefixRe.findFirstIn(s.trim).flatMap { p =>
      try {
        val v = BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        if (v.abs >= BigDecimal(10).pow(32)) None else Some(v)
      } catch { case _: Exception => None }
    }

  private def tinyintModel(s: String): Int =
    prefix(s).map { v =>
      val r = v.setScale(0, BigDecimal.RoundingMode.HALF_UP)
      r.max(BigDecimal(-128)).min(BigDecimal(127)).toInt
    }.getOrElse(0)

  private def decimalModel(s: String): java.math.BigDecimal =
    prefix(s).map { v =>
      v.max(BigDecimal("-999.99")).min(BigDecimal("999.99"))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    }.getOrElse(BigDecimal(0).setScale(2)).bigDecimal

  private val SetDomain = Seq("a", "b", "c")
  private def setModel(s: String): String =
    if (s.isEmpty) ""
    else {
      val elems = s.split(",", -1)
      if (elems.forall(SetDomain.contains))
        SetDomain.filter(elems.contains).mkString(",")
      // Spark's string→long cast trims surrounding whitespace — the
      // model must too, or ' 5' diverges
      else s.trim.toLongOption match {
        case Some(n) if n >= 0 && n < 8 =>
          SetDomain.zipWithIndex.collect {
            case (v, i) if ((n >> i) & 1L) == 1L => v
          }.mkString(",")
        case _ => ""
      }
    }

  private def numericCases(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val fixed = Seq("NaN", "", "  5  ", "12abc", "-", "+", ".5", "-.5",
      "127.5", "-127.5", "127.49", "999.994", "999.996", "-999.996",
      "1e3", "2.5e-1", "0", "-0")
    fixed ++ (0 until n).map { _ =>
      rnd.nextInt(4) match {
        case 0 => rnd.between(-100000L, 100000L).toString
        case 1 =>
          val frac = (0 until rnd.nextInt(4))
            .map(_ => rnd.nextInt(10)).mkString
          s"${rnd.between(-2000L, 2000L)}.$frac"
        case 2 => rnd.between(-200L, 200L).toString + "junk"
        case _ => rnd.alphanumeric.take(rnd.nextInt(6)).mkString
      }
    }
  }

  private def setCases(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val pool = Seq("a", "b", "c", "x")
    Seq("", "a", "c,a", "a,a,b", "0", "7", "8", "5", " 5", " 6 ",
      "a,x", "nope") ++
      (0 until n).map { _ =>
        rnd.nextInt(3) match {
          case 0 => (0 until 1 + rnd.nextInt(4))
            .map(_ => pool(rnd.nextInt(pool.length))).mkString(",")
          case 1 => rnd.nextInt(12).toString
          case _ => rnd.alphanumeric.take(rnd.nextInt(4)).mkString
        }
      }
  }

  test("lenient tinyint/decimal/set match the plain-Scala model on 500+ cases") {
    import spark.implicits._
    val schema = graft.schema.MysqlDdl.parse(
      """CREATE TABLE t (id int, b tinyint NOT NULL,
        |  d decimal(5,2) NOT NULL, st set('a','b','c') NOT NULL);""".stripMargin)
    val nums = numericCases(seed = 7, n = 250)
    val sets = setCases(seed = 11, n = nums.size)
    val rows = nums.zipAll(sets, "0", "").zipWithIndex.map {
      case ((num, st), i) => (i.toString, num, num, st)
    }
    val out = RowTransform.applySchema(
      rows.toDF("id", "b", "d", "st"),
      schema, RowTransform.CastPolicy.Lenient)
      .orderBy(col("id").cast("int")).collect()
    rows.sortBy(_._1.toInt).zip(out).foreach { case ((_, num, _, st), r) =>
      assert(r.getInt(1) === tinyintModel(num), s"tinyint('$num')")
      assert(r.getDecimal(2) === decimalModel(num), s"decimal('$num')")
      assert(r.getString(3) === setModel(st), s"set('$st')")
    }
  }
}
