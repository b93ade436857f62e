package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ZOrder2.zorder2

class ZOrderSpec extends SparkSpec {

  test("kernel pins: known interleave values") {
    assert(ZOrder.interleave(0L, 0L) === 0L)
    assert(ZOrder.interleave(1L, 0L) === 1L)
    assert(ZOrder.interleave(0L, 1L) === 2L)
    assert(ZOrder.interleave(3L, 3L) === 15L)
    assert(ZOrder.interleave(0xFFFFFFFFL, 0L) === 0x5555555555555555L)
    assert(ZOrder.interleave(0L, 0xFFFFFFFFL) === 0xAAAAAAAAAAAAAAAAL)
    assert(ZOrder.interleave(0xFFFFFFFFL, 0xFFFFFFFFL) === -1L)
  }

  test("spread32 is exact bit placement") {
    // bit i of x lands at bit 2i
    (0 until 32).foreach { i =>
      assert(ZOrder.spread32(1L << i) === (1L << (2 * i)))
    }
  }

  test("expression matches kernel through codegen, int and long inputs") {
    import spark.implicits._
    val rows = Seq((1, 7L), (123456, 654321L), (0, 0L), (-1, 2L))
      .toDF("a", "b")
      .select(col("a"), col("b"), zorder2(col("a"), col("b")).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) === ZOrder.interleave(r.getInt(0).toLong, r.getLong(1)))
    }
  }

  test("null propagates") {
    import spark.implicits._
    val r = Seq((Some(1), None: Option[Int])).toDF("a", "b")
      .select(zorder2(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
  }

  test("registered in SQL via extensions") {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    graft.GraftExtensions.functions.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
    val r = spark.sql("SELECT zorder2(5, 9)").collect()(0).getLong(0)
    assert(r === ZOrder.interleave(5L, 9L))
  }

  test("z-sort clusters both dimensions (range-pruning property)") {
    import spark.implicits._
    // 32x32 grid sorted by z, cut into 16 equal ranges: each range's
    // bounding box must stay small in BOTH dims (a lexicographic sort
    // would give full-height stripes in the second dim).
    val pts = for (a <- 0 until 32; b <- 0 until 32) yield (a, b)
    val sorted = pts.sortBy { case (a, b) => ZOrder.interleave(a.toLong, b.toLong) }
    val ranges = sorted.grouped(64).toSeq // 16 ranges of 64 points
    ranges.foreach { r =>
      val (as, bs) = (r.map(_._1), r.map(_._2))
      assert(as.max - as.min <= 8, s"a-extent ${as.max - as.min}")
      assert(bs.max - bs.min <= 8, s"b-extent ${bs.max - bs.min}")
    }
  }
}
