package graft.transform

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RowTransformSpec extends SparkSpec {

  test("chunkedRowId is dense, unique, and follows range order") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartitionByRange(5, col("k")).sortWithinPartitions("k")
    val withId = RowTransform.chunkedRowId(df, "rid")
    val rows = withId.select("k", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === 1000)
    assert(rows.map(_._2).sorted.toSeq === (1L to 1000L))
    // global key order == id order (ranges are ordered, partitions sorted)
    assert(rows.sortBy(_._1).map(_._2).toSeq === (1L to 1000L))
  }

  test("autoRandom packs shard bits above the row id") {
    import spark.implicits._
    val df = Seq((1L, 3L), (100L, 31L)).toDF("rid", "shard")
    val out = df.select(RowTransform.autoRandom(col("rid"), col("shard")).as("id"))
      .collect().map(_.getLong(0))
    assert(out(0) === (3L << 58 | 1L))
    assert(out(1) === (31L << 58 | 100L))
  }

  test("permute fills defaults and drops unknown columns") {
    import spark.implicits._
    val schema = graft.schema.MysqlDdl.parse(
      "CREATE TABLE t (a int NOT NULL, b varchar(5) DEFAULT 'dflt', c int)")
    val file = Seq((7, "x")).toDF("a", "junk")
    val out = RowTransform.applySchema(file, schema).collect()(0)
    assert(out.getInt(0) === 7)
    assert(out.getString(1) === "dflt")
    assert(out.isNullAt(2))
  }
}
