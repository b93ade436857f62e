package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Minimal resumable job state (the reference's checkpoint surface,
  * `lightning/checkpoints/checkpoints.go` — per-table status machine).
  * One JSON line per table-state transition, append-only; the latest
  * line per key wins, so a crashed run resumes by replaying the file.
  * Driver-side (state is O(#tables), not O(data)); a cluster
  * deployment would point `dir` at a shared filesystem.
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

  def get(key: String): Option[Record] = cache.get(key)

  def put(r: Record): Unit = {
    cache(r.key) = r
    file.foreach { f =>
      Files.writeString(f, render(r) + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }
}

object JobState {
  case class Record(key: String, status: String, nRows: Long, checksum: Long)

  private[pipeline] def render(r: Record): String =
    s"""{"key":"${r.key}","status":"${r.status}","nRows":${r.nRows},"checksum":${r.checksum}}"""

  private val Re =
    """\{"key":"([^"]*)","status":"([^"]*)","nRows":(-?\d+),"checksum":(-?\d+)\}""".r

  private[pipeline] def parse(line: String): Option[Record] = line.trim match {
    case Re(k, s, n, c) => Some(Record(k, s, n.toLong, c.toLong))
    case _ => None
  }
}
