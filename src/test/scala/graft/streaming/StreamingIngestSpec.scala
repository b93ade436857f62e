package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.schema.MysqlDdl

class StreamingIngestSpec extends SparkSpec {

  private val ddl =
    "CREATE TABLE st (id int NOT NULL, v varchar(10), " +
      "vv varchar(20) AS (concat(v, '!')) STORED, PRIMARY KEY (id));"

  test("streaming ingest drains landing files exactly once across restarts") {
    val schema = MysqlDdl.parse(ddl)
    val landing = Files.createTempDirectory("graft_sing_src").toString
    val out = Files.createTempDirectory("graft_sing_out").toString
    val ckpt = Files.createTempDirectory("graft_sing_ckpt").toString

    Files.writeString(Paths.get(landing, "b1.csv"), "1,\"a\"\n2,\"b\"\n")
    val q1 = StreamingIngest.run(spark, landing, schema, out, ckpt)
    q1.awaitTermination()
    val r1 = spark.read.parquet(out).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(r1.toSeq === Seq((1, "a", "a!"), (2, "b", "b!")))

    // restart with a new file landed: only the NEW file is ingested —
    // the source checkpoint remembers b1.csv (file-level resume)
    Files.writeString(Paths.get(landing, "b2.csv"), "3,\\N\n")
    val q2 = StreamingIngest.run(spark, landing, schema, out, ckpt)
    q2.awaitTermination()
    val r2 = spark.read.parquet(out).collect()
      .map(r => (r.getInt(0), Option(r.getString(1)))).sortBy(_._1)
    assert(r2.toSeq === Seq((1, Some("a")), (2, Some("b")), (3, None)))

    // idempotent: a third drain with nothing new appends nothing
    val q3 = StreamingIngest.run(spark, landing, schema, out, ckpt)
    q3.awaitTermination()
    assert(spark.read.parquet(out).count() === 3)
  }

  test("streaming ingest with a reordered header name-matches like the batch path") {
    val schema = MysqlDdl.parse(ddl)
    val landing = Files.createTempDirectory("graft_sing_hdr_src").toString
    val out = Files.createTempDirectory("graft_sing_hdr_out").toString
    val ckpt = Files.createTempDirectory("graft_sing_hdr_ckpt").toString
    // header order v,id — reversed relative to the schema
    Files.writeString(Paths.get(landing, "b1.csv"), "v,id\n\"a\",1\n\"b\",2\n")
    val q = StreamingIngest.run(spark, landing, schema, out, ckpt,
      dialect = graft.sources.CsvDialect(header = true))
    q.awaitTermination()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(rows.toSeq === Seq((1, "a", "a!"), (2, "b", "b!")))
  }
}
