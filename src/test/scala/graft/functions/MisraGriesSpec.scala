package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MisraGriesSpec extends SparkSpec {

  test("undercount never exceeds N/k, whatever the fold/merge order") {
    val mg = new MisraGries(8)
    // Zipf-ish stream: key i appears 200/i times, N = sum
    val stream = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"k$i"))
    val n = stream.size
    // three adversarial orders: sorted, reverse, interleaved
    val orders = Seq(stream, stream.reverse,
      stream.zipWithIndex.sortBy { case (_, i) => (i % 7, i) }.map(_._1))
    for (s <- orders) {
      // fold in 5 separately-reduced groups, then merge pairwise
      val parts = s.grouped(math.max(1, s.size / 5)).toSeq
        .map(_.foldLeft(mg.zero)(mg.reduce))
      val summary = parts.reduce(mg.merge)
      assert(summary.size <= 8)
      val exact = s.groupBy(identity).view.mapValues(_.size.toLong).toMap
      for ((k, c) <- summary) {
        assert(c <= exact(k), s"$k overcounted: $c > ${exact(k)}")
        assert(exact(k) - c <= n / 8, s"$k undercount ${exact(k) - c} > N/k")
      }
      // superset guarantee: every true heavy hitter survives
      for ((k, c) <- exact if c > n / 8)
        assert(summary.contains(k), s"true heavy hitter $k missing")
    }
  }

  test("the distributed sketch contains every true heavy hitter under any partitioning") {
    import spark.implicits._
    val rows = (1 to 30).flatMap(i => Seq.fill(300 / i)(s"w$i"))
    val n = rows.size.toLong
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val trueHH = exact.collect { case (k, c) if c * 16 > n => k }.toSet
    assert(trueHH.nonEmpty)
    for (parts <- Seq(1, 3, 17)) {
      val df = rows.toDF("tok").repartition(parts)
      val hh = df.agg(map_keys(MisraGries.sketch(16, col("tok"))).as("hh"))
        .collect()(0).getSeq[String](0).toSet
      assert(trueHH.subsetOf(hh), s"parts=$parts missing ${trueHH -- hh}")
      assert(hh.size <= 16)
    }
  }
}
