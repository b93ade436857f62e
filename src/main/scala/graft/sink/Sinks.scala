package graft.sink

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoders}

import graft.sources.SqlLiterals

/** Bulk-load sinks (SURVEY §2.5 D1–D6 + §2.4 E3/E4).
  *
  * The reference's local backend external-sorts all KVs in an LSM and
  * ships ≤96 MiB sorted ranges (`lightning/backend/local.go:877-950`).
  * Spark's sort-based shuffle *is* that external sort:
  * `repartitionByRange(pk).sortWithinPartitions(pk)` yields globally
  * range-partitioned, internally sorted output — each task writes one
  * "SST", the commit protocol is the ingest. AQE's advisory partition
  * size plays the role of the 96 MiB range splitter.
  */
object SortedParquetSink {

  /** Range-partitioned, sorted, verified bulk write.
    *
    * @param numRanges target range count; on a real cluster size this
    *   as totalBytes / 96 MiB like the reference's splitter. 0 = let
    *   Spark/AQE choose.
    */
  def write(df: DataFrame, path: String, sortCols: Seq[String], numRanges: Int = 0,
      mode: String = "overwrite"): Unit = {
    val keys = sortCols.map(col)
    val ranged =
      if (numRanges > 0) df.repartitionByRange(numRanges, keys: _*)
      else df.repartitionByRange(keys: _*)
    ranged
      .sortWithinPartitions(keys: _*)
      .write.mode(mode).parquet(path)
  }

  /** [[write]] with an observed metric riding the write pass, so the
    * caller gets an aggregate (e.g. the pre-write checksum) without a
    * second scan of the source.
    *
    * The observation is attached ABOVE the range shuffle: the
    * RangePartitioner's sampling job re-executes the plan below the
    * exchange, so a metric observed there accumulates twice (verified:
    * a 1000-row df observed under `repartitionByRange` reports
    * count=2000). Post-shuffle, rows flow through exactly once.
    */
  def writeObserved(df: DataFrame, path: String, sortCols: Seq[String],
      obs: org.apache.spark.sql.Observation, metric: DataFrame => Column,
      numRanges: Int = 0, mode: String = "overwrite"): Unit = {
    val keys = sortCols.map(col)
    val ranged =
      if (numRanges > 0) df.repartitionByRange(numRanges, keys: _*)
      else df.repartitionByRange(keys: _*)
    ranged
      .observe(obs, metric(ranged))
      .sortWithinPartitions(keys: _*)
      .write.mode(mode).parquet(path)
  }

  /** Write with a dedup policy applied on the key, mirroring the tidb
    * backend's on-duplicate switch (reference
    * `lightning/config/config.go:62-67`): "error" (assert unique),
    * "replace" (last wins), "ignore" (first wins).
    */
  def writeDedup(df: DataFrame, path: String, keyCols: Seq[String],
      policy: String, orderCol: Option[String] = None): Unit =
    write(dedup(df, keyCols, policy, orderCol), path, keyCols)

  /** The on-duplicate policy as a standalone operator. */
  def dedup(df: DataFrame, keyCols: Seq[String],
      policy: String, orderCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    policy match {
      case "error" => df // caller asserts uniqueness separately
      case "replace" | "ignore" =>
        val ord = orderCol.map(col).getOrElse(lit(1))
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(if (policy == "replace") ord.desc else ord.asc)
        df.withColumn("_g_rn", row_number().over(w))
          .filter(col("_g_rn") === 1).drop("_g_rn")
    }
  }
}

/** INSERT-statement emitter (SURVEY E3/E4 + T9): renders rows as
  * MyDumper-style `INSERT INTO t (cols) VALUES (…),(…);` batches. The
  * reference streams these over MySQL protocol
  * (`lightning/backend/tidb.go:350-419`); our file form doubles as the
  * fixture generator for the dump-parser round-trip, and a JDBC
  * `foreachPartition` variant would reuse the same statement builder.
  * Fully distributed: one statement batch per `rowsPerStatement` rows,
  * rendered inside the executors.
  */
object InsertDumpWriter {

  def statements(df: DataFrame, table: String, rowsPerStatement: Int = 100): DataFrame = {
    val cols = df.columns
    val header = s"INSERT INTO $table (${cols.mkString(",")}) VALUES "
    import df.sparkSession.implicits._
    df.mapPartitions { it =>
      it.grouped(rowsPerStatement).map { batch =>
        val tuples = batch.map { row =>
          cols.indices.map(i => SqlLiterals.literal(row.get(i))).mkString("(", ",", ")")
        }
        header + tuples.mkString(",\n") + ";"
      }
    }(Encoders.STRING).toDF("stmt")
  }

  def write(df: DataFrame, table: String, path: String, rowsPerStatement: Int = 100): Unit =
    statements(df, table, rowsPerStatement).write.mode("overwrite").text(path)
}
