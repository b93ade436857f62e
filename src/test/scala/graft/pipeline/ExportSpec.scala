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
}
