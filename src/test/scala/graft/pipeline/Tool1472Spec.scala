package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's `tests/tool_1472` replayed over its own data:
  * pre-calculated auto-increment values land, the allocator rebases
  * past their max, and a POST-IMPORT insert continues at max+1
  * (run.sh:24-31 — `count(a): 3`, `max(a): 5` on the auto-inc pk
  * table; `b: 10` on the non-pk auto-inc column). The follow-up
  * inserts are replayed as an incremental append batch (the engine's
  * insert path), resuming from the recorded allocator state.
  */
class Tool1472Spec extends SparkSpec {

  private val src = Paths.get("/root/reference/tests/tool_1472/data")

  test("auto-inc rebase past imported values; inserts continue at max+1") {
    assume(Files.exists(src), "reference tests not present")
    val dir = Files.createTempDirectory("graft_1472")
    Files.list(src).forEach(p => Files.copy(p, dir.resolve(p.getFileName)))
    val out = Files.createTempDirectory("graft_1472_out").toString
    val cfg = Ingest.Config(dir.toString, out,
      stateDir = Some(s"$out/_state"))

    val r1 = Ingest.run(spark, cfg)
    assert(r1.forall(_.checksumOk), r1.map(r => r.table -> r.checksumOk))
    val pk1 = spark.read.parquet(s"$out/EE1472.pk")
      .agg(count(col("a")), max(col("a"))).collect()(0)
    assert((pk1.getLong(0), pk1.getInt(1)) === ((2L, 4)))

    // run.sh: `insert into EE1472.pk values ();` and
    // `insert into EE1472.notpk (a) values (3333);`
    Files.writeString(dir.resolve("EE1472.pk.3.sql"),
      "insert into `pk` values ();\n")
    Files.writeString(dir.resolve("EE1472.notpk.3.sql"),
      "insert into `notpk` (a) values (3333);\n")
    val r2 = Ingest.run(spark, cfg)
    assert(r2.forall(_.checksumOk), r2.map(r => r.table -> r.checksumOk))

    // pin: count(a)=3, max(a)=5 — the omitted pk fills at 4+1
    val pk2 = spark.read.parquet(s"$out/EE1472.pk")
      .agg(count(col("a")), max(col("a"))).collect()(0)
    assert((pk2.getLong(0), pk2.getInt(1)) === ((3L, 5)))

    // pin: b=10 where a=3333 — the non-pk auto-inc continues at 9+1
    val b = spark.read.parquet(s"$out/EE1472.notpk")
      .where(col("a") === 3333).select("b").collect()
    assert(b.length === 1)
    assert(b(0).getInt(0) === 10)
  }
}
