package graft.pipeline

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.schema.MysqlDdl
import graft.sink.InsertDumpWriter

/** Export — the dumpling direction: render warehouse tables back to
  * the MyDumper layout [[Ingest]] (and the reference) consume:
  * `{db}-schema-create.sql`, `{db}.{table}-schema.sql` (DDL via
  * [[MysqlDdl.render]], the parser's inverse) and
  * `{db}.{table}.{NNNN}.sql` INSERT shards. Statement rendering runs
  * distributed ([[InsertDumpWriter]]); only the two small schema files
  * and the shard renames touch the driver. Shards make files the
  * parallel unit on re-import, exactly like MyDumper's ≤256 MiB
  * splits.
  */
object Export {

  /** Export one DataFrame as a MyDumper table. Returns the data-file
    * paths written.
    */
  def table(df: DataFrame, db: String, tbl: String, outDir: String,
      rowsPerStatement: Int = 100, shards: Int = 4,
      primaryKey: Seq[String] = Nil): Seq[Path] = {
    val out = Paths.get(outDir)
    Files.createDirectories(out)
    val schema = MysqlDdl.fromStruct(db, tbl, df.schema, primaryKey)
    val create = out.resolve(s"$db-schema-create.sql")
    if (!Files.exists(create))
      Files.writeString(create, s"CREATE DATABASE IF NOT EXISTS `$db`;\n")
    Files.writeString(out.resolve(s"$db.$tbl-schema.sql"),
      MysqlDdl.render(schema) + "\n")
    val tmp = out.resolve(s"_$tbl.tmpdir")
    InsertDumpWriter.statements(df.repartition(shards), tbl, rowsPerStatement)
      .write.mode("overwrite").text(tmp.toString)
    val parts = listDir(tmp)
      .filter(_.getFileName.toString.startsWith("part-")).sortBy(_.toString)
    val moved = parts.zipWithIndex.map { case (p, i) =>
      val target = out.resolve(f"$db.$tbl.${i + 1}%04d.sql")
      Files.move(p, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      target
    }
    deleteRec(tmp)
    moved
  }

  /** Export every `{db}.{table}` parquet dir under a warehouse root. */
  def run(spark: SparkSession, warehouseDir: String, outDir: String,
      db: String, rowsPerStatement: Int = 100, shards: Int = 4): Map[String, Seq[Path]] = {
    val tables = listDir(Paths.get(warehouseDir))
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString)
      .filter(_.startsWith(s"$db."))
      .sorted
    tables.map { dirName =>
      val tbl = dirName.stripPrefix(s"$db.")
      val df = spark.read.parquet(s"$warehouseDir/$dirName")
      tbl -> table(df, db, tbl, outDir, rowsPerStatement, shards)
    }.toMap
  }

  // directory streams hold an OS fd until closed — always drain
  // eagerly inside the resource scope
  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq
    } finally s.close()
  }

  private def deleteRec(p: Path): Unit = graft.GraftSession.deleteRec(p)
}
