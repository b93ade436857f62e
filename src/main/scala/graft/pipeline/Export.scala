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
    // SPARK-23207 guard: a keyless repartition(shards) assigns rows
    // round-robin by INPUT ORDER, and the graft sessions run with
    // sortBeforeRepartition=false — safe only when this df's row order
    // is reproducible under task retry. Export takes CALLER-supplied
    // dfs, so the decision is made from the plan, not a comment: a
    // narrow deterministic chain over leaf relations keeps the cheap
    // round-robin (even shards, no sort); any other shape — exchanges,
    // aggregations, nondeterministic expressions, where a retried task
    // can see a permuted row order — shards by a deterministic HASH of
    // the full row instead, which is order-insensitive by construction
    // (a retry re-hashes the same values to the same shard). The hash
    // spread can leave a shard empty for tiny pathological inputs;
    // correctness of the dump outranks an even file count there.
    val spread =
      if (orderStableOnRetry(df)) df.repartition(shards)
      else df.repartition(shards, org.apache.spark.sql.functions.xxhash64(
        df.columns.map(org.apache.spark.sql.functions.col): _*))
    InsertDumpWriter.statements(spread, tbl, rowsPerStatement)
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

  /** Whether `df`'s row order is reproducible when a task re-runs —
    * the condition under which an unsorted round-robin repartition is
    * retry-safe. True only for a narrow deterministic chain over leaf
    * relations (file scan / local rows): a file split re-reads in the
    * same order. Any exchange upstream (including graft's own fanOut
    * repartition) makes downstream row order depend on shuffle-fetch
    * arrival, and nondeterministic expressions re-draw on retry.
    */
  private[pipeline] def orderStableOnRetry(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, Project}
    df.queryExecution.optimizedPlan.find {
      case p @ (_: LeafNode | _: Project | _: Filter) =>
        !p.expressions.forall(_.deterministic)
      case _ => true
    }.isEmpty
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
