package graft.sink

import java.nio.file.Files

import graft.SparkSpec

class SortedSinkSpec extends SparkSpec {

  test("rangesFor sizes ranges at 96 MiB per range from the plan estimate") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    assert(SortedParquetSink.rangesFor(df) === 1) // tiny table → one range
    // a small byte budget forces multiple ranges from the same estimate
    assert(SortedParquetSink.rangesFor(df, targetBytes = 64L) > 1)
  }

  test("default write produces one file per computed range, globally ordered") {
    import spark.implicits._
    val df = (1 to 500).map(i => ((i * 37) % 500L, i.toString)).toDF("k", "v")
    val out = Files.createTempDirectory("graft-sorted-sink").toString
    SortedParquetSink.write(df, out, Seq("k"))
    val back = spark.read.parquet(out).orderBy("k").collect().map(_.getLong(0))
    assert(back.length === 500)
    assert(back.toSeq === back.sorted.toSeq)
  }
}
