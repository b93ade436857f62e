package graft.sink

import graft.SparkSpec

/** E4 on-duplicate "error" policy (reference
  * `lightning/config/config.go:62-67`, `tests/tidb_duplicate_data`):
  * a planted duplicate must FAIL the job loudly, a clean input must
  * pass through untouched, and the conflict report must name exactly
  * the duplicated keys.
  */
class DedupErrorSpec extends SparkSpec {

  private def df(pairs: (Long, String)*) = {
    import spark.implicits._
    pairs.toDF("k", "v")
  }

  test("error policy: clean input passes through with rows and column order intact") {
    val in = df(1L -> "a", 2L -> "b", 3L -> "c")
    val out = SortedParquetSink.dedup(in, Seq("k"), "error")
    assert(out.columns.toSeq === Seq("k", "v"))
    assert(out.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("error policy: planted duplicate fails loudly, naming the key") {
    val in = df(1L -> "a", 2L -> "b", 2L -> "dup")
    val e = intercept[Exception] {
      SortedParquetSink.dedup(in, Seq("k"), "error").collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("duplicate key"), msg)
    assert(msg.contains("2"), msg)
  }

  test("conflicts report: empty on clean input, lists key and multiplicity on dups") {
    assert(SortedParquetSink.conflicts(df(1L -> "a", 2L -> "b"), Seq("k")).count() === 0)
    val rep = SortedParquetSink.conflicts(
      df(1L -> "a", 2L -> "b", 2L -> "c", 2L -> "d"), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rep.toSeq === Seq(2L -> 3L))
  }
}
