package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** D6: post-import compaction (reference `fullCompact`/`doCompact`,
  * `lightning/restore/restore.go:1710-1737`). The reference asks every
  * store to compact its LSM; the columnar analog rewrites a table's
  * many range files into `n` larger ones — same motivation (read
  * amplification after a multi-batch import), same placement (after
  * verification). All moves go through the Hadoop FS API, so the
  * rewrite works wherever the table lives (local, HDFS, S3A).
  */
object Compaction {

  /** Rewrite `path` into `n` files; returns (files before, after). */
  def compact(spark: SparkSession, path: String, n: Int): (Int, Int) = {
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = countDataFiles(spark, path)
    val tmp = new Path(path + ".compacting")
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(target, true)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"rename $tmp -> $target failed")
    (before, countDataFiles(spark, path))
  }

  private def countDataFiles(spark: SparkSession, path: String): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
  }
}
