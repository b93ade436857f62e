package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Minimal resumable job state (the reference's checkpoint surface,
  * `lightning/checkpoints/checkpoints.go` — per-table status machine
  * with per-chunk progress, `checkpoints.go:231-274`).
  * One JSON line per table-state transition, append-only; the latest
  * line per key wins, so a crashed run resumes by replaying the file.
  * Each record carries the verified checksum triple AND the set of
  * source files it covers, which is what makes file-level incremental
  * resume possible: a re-run imports only data files not in the
  * verified set (see `Ingest.run`). Driver-side (state is O(#tables +
  * #files), not O(data)); a cluster deployment would point `dir` at a
  * shared filesystem.
  */
class JobState(dir: Option[String]) {

  import JobState._

  private val file = dir.map { d =>
    Files.createDirectories(Paths.get(d))
    Paths.get(d, "state.jsonl")
  }

  private val cache: scala.collection.mutable.Map[String, Record] = {
    val m = scala.collection.mutable.Map[String, Record]()
    file.foreach { f =>
      if (Files.exists(f)) {
        Files.readAllLines(f).forEach { line =>
          parse(line).foreach(r => m(r.key) = r)
        }
      }
    }
    m
  }

  def get(key: String): Option[Record] = synchronized { cache.get(key) }

  // synchronized: concurrent table restores (Ingest tableConcurrency)
  // record their state from separate driver threads
  def put(r: Record): Unit = synchronized {
    cache(r.key) = r
    file.foreach { f =>
      Files.writeString(f, render(r) + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }
}

object JobState {
  /** `files` must not contain `"` or `,` (enforced nowhere — dump file
    * paths never do; the reference's checkpoint DB has the same
    * plain-path assumption).
    */
  /** `maxId` is the table's max auto-increment/row-ID value at record
    * time — the allocator rebase point for incremental appends
    * (reference persists the same rebase in its checkpoint + final
    * `ALTER TABLE AUTO_INCREMENT=`, `lightning/restore/tidb.go:349-367`).
    */
  /** `taskTs` is the import's epoch-millis task timestamp — the ONE
    * value every CURRENT_TIMESTAMP default evaluates to for the whole
    * table, stable across chunk batches and crash-resume (reference
    * `tests/checkpoint_timestamp`: 98 all-default rows through a
    * mid-chunk crash land ONE distinct ts; the reference anchors its
    * task id to the same clock). 0 = legacy record, a resume mints a
    * fresh value.
    */
  case class Record(key: String, status: String, nRows: Long, checksum: Long,
      nBytes: Long = 0L, files: Seq[String] = Nil, maxId: Long = 0L,
      maxRowid: Long = 0L, taskTs: Long = 0L)

  private[pipeline] def render(r: Record): String = {
    val fs = r.files.map(f => "\"" + f + "\"").mkString(",")
    s"""{"key":"${r.key}","status":"${r.status}","nRows":${r.nRows},""" +
      s""""checksum":${r.checksum},"nBytes":${r.nBytes},"files":[$fs],""" +
      s""""maxId":${r.maxId},"maxRowid":${r.maxRowid},"taskTs":${r.taskTs}}"""
  }

  private val Re =
    ("""\{"key":"([^"]*)","status":"([^"]*)","nRows":(-?\d+),"checksum":(-?\d+)""" +
      """(?:,"nBytes":(-?\d+))?(?:,"files":\[([^\]]*)\])?(?:,"maxId":(-?\d+))?""" +
      """(?:,"maxRowid":(-?\d+))?(?:,"taskTs":(-?\d+))?\}""").r

  private[pipeline] def parse(line: String): Option[Record] = line.trim match {
    case Re(k, s, n, c, b, fs, mx, mr, ts) =>
      val files = Option(fs).filter(_.nonEmpty)
        .map(_.split(",").toSeq.map(_.stripPrefix("\"").stripSuffix("\"")))
        .getOrElse(Nil)
      Some(Record(k, s, n.toLong, c.toLong,
        Option(b).map(_.toLong).getOrElse(0L), files,
        Option(mx).map(_.toLong).getOrElse(0L),
        Option(mr).map(_.toLong).getOrElse(0L),
        Option(ts).map(_.toLong).getOrElse(0L)))
    case _ => None
  }
}
