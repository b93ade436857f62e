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
    import scala.jdk.CollectionConverters._
    val parts = Files.list(tmp).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq.sortBy(_.toString)
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
    import scala.jdk.CollectionConverters._
    val root = Paths.get(warehouseDir)
    val tables = Files.list(root).iterator().asScala
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString)
      .filter(_.startsWith(s"$db."))
      .toSeq.sorted
    tables.map { dirName =>
      val tbl = dirName.stripPrefix(s"$db.")
      val df = spark.read.parquet(s"$warehouseDir/$dirName")
      tbl -> table(df, db, tbl, outDir, rowsPerStatement, shards)
    }.toMap
  }

  private def deleteRec(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
  }
}
