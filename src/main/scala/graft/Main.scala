package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.{HttpServer, Ingest, Server, TomlConfig}

/** The reference's CLI entry point re-expressed: `tidb-lightning
  * --config x.toml` (reference `cmd/tidb-lightning/main.go:30-70`)
  * becomes `runMain graft.Main --config x.toml`. One-shot mode runs
  * the import immediately and exits nonzero on failure; server mode
  * (`lightning.server-mode = true`) starts the task API on
  * `lightning.status-addr` and drains the spool queue until
  * `<spool>/stop` appears — the same switch the reference documents in
  * its sample config.
  */
object Main {

  def main(args: Array[String]): Unit = {
    def opt(flag: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }
    val cfgPath = opt("--config").getOrElse(
      sys.error("usage: graft.Main --config <tidb-lightning.toml> " +
        "[--target-dir <dir>] [--spool <dir>]"))
    val loaded = TomlConfig.loadFile(cfgPath, opt("--target-dir"))
    if (loaded.ignored.nonEmpty)
      System.err.println(
        s"[config] ignored keys (no Spark analog): ${loaded.ignored.mkString(", ")}")

    if (loaded.serverMode) {
      // reference server mode: wait for tasks over HTTP
      // (`lightning.go:196-214`); tasks arrive as TOML or JSON bodies
      val port = loaded.statusAddr
        .map(_.split(":").last).filter(_.nonEmpty).map(_.toInt).getOrElse(8289)
      val spool = opt("--spool").getOrElse(s"${loaded.config.targetDir}/_spool")
      Files.createDirectories(Paths.get(spool))
      val srv = HttpServer.start(spool, port)
      println(s"graft server mode on http://127.0.0.1:${srv.getAddress.getPort} " +
        s"(spool: $spool) — stop with ${spool}/stop")
      val spark = GraftSession.build()
      val stop = Paths.get(spool, "stop")
      try {
        while (!Files.exists(stop)) {
          Server.drainOnce(spark, spool).foreach { r =>
            println(s"task ${r.task}: ok=${r.ok} tables=${r.tables} ${r.detail}")
          }
          Thread.sleep(2000L)
        }
      } finally { srv.stop(0); spark.stop() }
    } else {
      val spark = GraftSession.build()
      try {
        val reports = Ingest.run(spark, loaded.config)
        reports.foreach { r =>
          println(f"${r.db}.${r.table}%-30s rows=${r.nRows}%-10d " +
            f"checksum_ok=${r.checksumOk} bad_rows=${r.badRows}" +
            (if (r.skipped) " (skipped: already imported)" else ""))
        }
        val failed = reports.filterNot(r => r.checksumOk || r.skipped)
        if (failed.nonEmpty && loaded.checksum == "required") {
          System.err.println(s"checksum FAILED for: ${failed.map(_.table).mkString(", ")}")
          sys.exit(1)
        } else if (failed.nonEmpty)
          System.err.println(s"[optional checksum] mismatch ignored for: " +
            failed.map(_.table).mkString(", "))
      } finally spark.stop()
    }
  }
}
