package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's `tests/view` replayed over its own data dir: a
  * CROSS-DATABASE view chain (db0.v2 → db1.v1 → db1.tbl) with
  * DEFINER/ALGORITHM noise, explicit view column lists, and
  * backtick-qualified references. Pins are the run.sh values.
  */
class ViewChainSpec extends SparkSpec {

  test("cross-database view chain restores and answers the pinned queries") {
    val src = Paths.get("/root/reference/tests/view/data")
    assume(Files.exists(src), "reference tests not present")
    val out = Files.createTempDirectory("graft_viewchain").toString
    val reports = Ingest.run(spark, Ingest.Config(src.toString, out))
    assert(reports.forall(_.checksumOk))
    // run.sh: SELECT count(*), sum(i) FROM db1.v1 → 3, 6
    val v1 = spark.table("v1").agg(count(lit(1)), sum(col("i"))).collect()(0)
    assert(v1.getLong(0) === 3L)
    assert(v1.getAs[Number](1).longValue === 6L)
    // run.sh: SELECT count(*), s FROM db0.v2 → 1 row, 'test1'
    val v2 = spark.table("v2").collect()
    assert(v2.length === 1)
    assert(v2(0).getAs[String]("s") === "test1")
  }
}
