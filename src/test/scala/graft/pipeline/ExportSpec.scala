package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Export.run over a multi-table warehouse: MyDumper naming, one
  * schema file per table, the shared schema-create file, shard counts,
  * and the files re-ingest cleanly.
  */
class ExportSpec extends SparkSpec {

  test("a two-table warehouse exports to the full MyDumper layout") {
    val wh = Files.createTempDirectory("graft_export_wh").toString
    val out = Files.createTempDirectory("graft_export_out").toString
    graft.GraftSession.table(spark, sf(), "nation")
      .write.parquet(s"$wh/exp.nation")
    graft.GraftSession.table(spark, sf(), "region")
      .write.parquet(s"$wh/exp.region")

    val written = Export.run(spark, wh, out, "exp", shards = 2)
    assert(written.keySet === Set("nation", "region"))

    val stream = Files.list(Paths.get(out))
    val names: Seq[String] =
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
      } finally stream.close()
    assert(names.contains("exp-schema-create.sql"))
    assert(names.contains("exp.nation-schema.sql"))
    assert(names.contains("exp.region-schema.sql"))
    assert(names.count(_.matches("""exp\.nation\.\d{4}\.sql""")) === 2)
    assert(names.count(_.matches("""exp\.region\.\d{4}\.sql""")) === 2)

    // and the exported dir re-ingests: full-circle row counts match
    val tgt = Files.createTempDirectory("graft_export_reimp").toString
    val reports = Ingest.run(spark, Ingest.Config(out, tgt))
    assert(reports.map(_.table).sorted === Seq("nation", "region"))
    assert(reports.forall(_.checksumOk))
    val n = spark.read.parquet(s"$tgt/exp.nation").count()
    assert(n === graft.GraftSession.table(spark, sf(), "nation").count())
  }

  test("a non-scan-rooted df exports via the order-insensitive hash spread") {
    // plan-shape classifier: a raw scan keeps the cheap round-robin;
    // anything with an exchange upstream (here: an aggregation, and the
    // fanOut path's repartition) must not — its row order can permute
    // under task retry, which round-robin-without-sort turns into
    // silent row loss/duplication (SPARK-23207)
    // NB GraftSession.table would NOT qualify — its fanOut can add a
    // keyless repartition, after which downstream order is fetch-order
    val scan = spark.read.parquet(s"${sf()}/nation.parquet")
      .where(col("n_nationkey") >= 0).select("n_nationkey", "n_name")
    val agg = graft.GraftSession.table(spark, sf(), "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("n"),
        sum("o_totalprice").as("total"))
    assert(!Export.orderStableOnRetry(agg), "post-aggregation order is not retry-stable")

    // and the hash-spread path round-trips every row byte-exactly
    val out = Files.createTempDirectory("graft_export_agg").toString
    Export.table(agg, "exp", "custagg", out, shards = 3)
    val tgt = Files.createTempDirectory("graft_export_agg_reimp").toString
    val reports = Ingest.run(spark, Ingest.Config(out, tgt))
    assert(reports.forall(_.checksumOk))
    // the re-import may carry pipeline bookkeeping columns — compare
    // exactly the exported ones
    val back = spark.read.parquet(s"$tgt/exp.custagg")
      .select(agg.columns.map(col): _*)
    assert(back.count() === agg.count())
    assert(back.exceptAll(agg).isEmpty && agg.exceptAll(back).isEmpty)
    // the scan-side classification is exercised by the first test's
    // Export.run (parquet scans); pin it explicitly too
    assert(Export.orderStableOnRetry(
      spark.read.parquet(s"$tgt/exp.custagg")))
    assert(Export.orderStableOnRetry(scan))
  }
}
