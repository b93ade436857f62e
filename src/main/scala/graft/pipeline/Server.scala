package graft.pipeline

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Server mode — the reference's HTTP task queue (§3.2,
  * `lightning/lightning.go:196-214`, handlers `:442-547`) as a
  * spool-directory queue, the driver-friendly equivalent that any
  * front end (cron, HTTP shim, workflow engine) can feed:
  *
  *   <spool>/queue/NNN-name.json   pending tasks, processed in
  *                                 lexicographic order (rename = the
  *                                 reference's front/back reorder verbs,
  *                                 delete = cancel)
  *   <spool>/done/…  /failed/…     task file + result line after the run
  *   <spool>/pause                 while present, the RUNNING import
  *                                 parks at its next table boundary
  *                                 (reference /pause + Pauser gate);
  *                                 delete to resume
  *   <spool>/stop                  drain loop exits after current poll
  *
  * A task file is a flat JSON object: `sourceDir`, `targetDir`,
  * optional `filters` (comma-separated), optional `stateDir`. Progress
  * is observable via the task's job-state records (the reference's
  * `/progress/table` analog).
  */
object Server {

  case class TaskResult(task: String, ok: Boolean, tables: Int, detail: String)

  /** Process every queued task once, in order; returns results. */
  def drainOnce(spark: SparkSession, spool: String): Seq[TaskResult] = {
    val queue = Paths.get(spool, "queue")
    if (!Files.isDirectory(queue)) return Seq.empty
    val done = Files.createDirectories(Paths.get(spool, "done"))
    val failed = Files.createDirectories(Paths.get(spool, "failed"))
    val listing = Files.list(queue)
    val tasks =
      try listing.iterator().asScala.toSeq
        .filter(_.toString.endsWith(".json")).sortBy(_.getFileName.toString)
      finally listing.close() // a leaked DirectoryStream fd per poll adds up in the server loop
    tasks.map { tf =>
      val name = tf.getFileName.toString
      val result =
        try {
          // <spool>/pause gates the running import at table boundaries
          // (the reference's /pause handler + Pauser gate); deleting
          // the file resumes mid-task.
          val cfg = parseTask(Files.readString(tf))
            .copy(pauseFile = Some(Paths.get(spool, "pause").toString))
          val reports = Ingest.run(spark, cfg)
          val ok = reports.forall(_.checksumOk)
          TaskResult(name, ok, reports.size,
            reports.map(r => s"${r.db}.${r.table}:${r.nRows}").mkString(","))
        } catch {
          case e: Exception =>
            TaskResult(name, ok = false, 0, s"error: ${e.getMessage}")
        }
      val dest = (if (result.ok) done else failed).resolve(name)
      Files.move(tf, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Files.writeString(dest.resolveSibling(name + ".result"),
        s"""{"task":${jsonStr(result.task)},"ok":${result.ok},""" +
          s""""tables":${result.tables},"detail":${jsonStr(result.detail)}}\n""")
      result
    }
  }

  /** Minimal JSON string escaping — error messages carry quotes and
    * newlines, which must not corrupt the result file.
    */
  private def jsonStr(s: String): String = {
    val sb = new StringBuilder("\"")
    Option(s).getOrElse("").foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= "\\u%04x".format(c.toInt)
      case c => sb += c
    }
    sb.append('"').toString
  }

  /** Minimal flat-JSON task parse (same conventions as JobState). */
  private[pipeline] def parseTask(json: String): Ingest.Config = {
    def str(key: String): Option[String] =
      (s""""$key"\\s*:\\s*"([^"]*)"""").r.findFirstMatchIn(json).map(_.group(1))
    val source = str("sourceDir").getOrElse(
      throw new IllegalArgumentException("task missing sourceDir"))
    val target = str("targetDir").getOrElse(
      throw new IllegalArgumentException("task missing targetDir"))
    Ingest.Config(
      sourceDir = source,
      targetDir = target,
      filters = str("filters").map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(Nil),
      stateDir = str("stateDir"))
  }

  /** Long-running loop: poll the queue until `<spool>/stop` appears. */
  def main(args: Array[String]): Unit = {
    val spool = args.headOption.getOrElse(
      sys.error("usage: Server <spoolDir> [pollMillis]"))
    val poll = args.lift(1).map(_.toLong).getOrElse(2000L)
    val spark = graft.GraftSession.build()
    val stop: Path = Paths.get(spool, "stop")
    try {
      while (!Files.exists(stop)) {
        drainOnce(spark, spool).foreach { r =>
          println(s"""task ${r.task}: ok=${r.ok} tables=${r.tables} ${r.detail}""")
        }
        Thread.sleep(poll)
      }
    } finally spark.stop()
  }
}
