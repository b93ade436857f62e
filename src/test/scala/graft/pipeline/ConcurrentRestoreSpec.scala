package graft.pipeline

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** The reference's `tests/concurrent-restore` analog: TWO live drain
  * loops share one spool (the reference runs two lightning instances
  * against one source). The atomic rename-claim must make every task
  * execute EXACTLY once across the racing loops, and dead-claimant
  * recovery must requeue only tasks whose owner process is gone.
  */
class ConcurrentRestoreSpec extends SparkSpec {

  private val TableCount = 8

  /** One tiny dump source per task — the reference's tblN shape
    * (`CREATE TABLE tblN(i TINYINT); INSERT INTO tblN VALUES (1);`).
    */
  private def mkSpool(): (String, Seq[String]) = {
    val spool = Files.createTempDirectory("graft_conc").toString
    val queue = Files.createDirectories(Paths.get(spool, "queue"))
    val targets = (1 to TableCount).map { i =>
      val src = Files.createTempDirectory(s"graft_conc_src$i")
      Files.writeString(src.resolve(s"restore_conc.tbl$i-schema.sql"),
        s"CREATE TABLE tbl$i(i TINYINT);")
      Files.writeString(src.resolve(s"restore_conc.tbl$i.sql"),
        s"INSERT INTO tbl$i VALUES (1);")
      val tgt = Files.createTempDirectory(s"graft_conc_tgt$i").toString
      Files.writeString(queue.resolve(f"$i%03d-tbl$i.json"),
        s"""{"sourceDir":"$src","targetDir":"$tgt"}""")
      tgt
    }
    (spool, targets)
  }

  private def listDir(spool: String, d: String): Seq[String] = {
    val p = Paths.get(spool, d)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val l = Files.list(p)
      try l.iterator().asScala.map(_.getFileName.toString).toSeq
      finally l.close()
    }
  }

  test("two racing drain loops execute every task exactly once") {
    val (spool, targets) = mkSpool()
    val executed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val loops = (1 to 2).map { _ =>
      new Thread(() => {
        try {
          var idle = 0
          while (idle < 3) { // three empty polls after the queue drains
            val r = Server.drainOnce(spark, spool)
            r.foreach { t => assert(t.ok, s"${t.task}: ${t.detail}"); executed.add(t.task) }
            if (r.isEmpty && listDir(spool, "queue").isEmpty) idle += 1
            Thread.sleep(25) // poll backoff: a tight FS spin under a
            // loaded suite starves the sibling loop's Spark jobs
          }
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    loops.foreach(_.start())
    loops.foreach(_.join(300000)) // generous under full-suite load
    assert(loops.forall(!_.isAlive), "both loops finished in time")
    assert(failures.isEmpty, failures.asScala.map(_.toString).mkString("\n"))
    // exactly once: the union of the two loops' executions covers all
    // tasks with NO duplicates
    val names = executed.asScala.toSeq
    assert(names.distinct.size === names.size, s"double execution: $names")
    assert(names.size === TableCount, names.sorted.mkString(","))
    assert(listDir(spool, "done").count(_.endsWith(".json")) === TableCount)
    assert(listDir(spool, "queue").isEmpty)
    assert(listDir(spool, "running").isEmpty, "no stranded claims")
    // every target holds its one imported row (reference: sum(i)=1)
    targets.zipWithIndex.foreach { case (tgt, i) =>
      val df = spark.read.parquet(s"$tgt/restore_conc.tbl${i + 1}")
      assert(df.collect().map(_.getInt(0)).toSeq === Seq(1), tgt)
    }
  }

  test("recovery requeues dead-claimant tasks, leaves live claims alone") {
    val spool = Files.createTempDirectory("graft_conc_rec").toString
    val running = Files.createDirectories(Paths.get(spool, "running"))
    Files.createDirectories(Paths.get(spool, "queue"))
    // the claimant pid rides the claim NAME (written by the atomic
    // claim rename — no claim can exist without a provable owner)
    // dead claimant: a pid from a process that has already exited
    val p = new ProcessBuilder("true").start()
    p.waitFor()
    Files.writeString(
      running.resolve(s"001-dead.json${Server.ClaimSuffix}${p.pid()}"),
      """{"sourceDir":"/x"}""")
    // live claimant: this very JVM
    Files.writeString(
      running.resolve(s"002-live.json${Server.ClaimSuffix}" +
        ProcessHandle.current().pid()),
      """{"sourceDir":"/y"}""")
    // legacy suffix-less entry: conservative — must stay (no pid)
    Files.writeString(running.resolve("003-orphan.json"), """{"sourceDir":"/z"}""")
    // the dead claim's lock must be released with it
    Files.writeString(running.resolve(s"001-dead.json${Server.LockSuffix}"),
      p.pid().toString)
    // claimless lock from a dead pid (crash between O_EXCL create and
    // the task move) — released so the queued task is claimable again
    Files.writeString(running.resolve(s"004-lockonly.json${Server.LockSuffix}"),
      p.pid().toString)
    // claimless lock from THIS live JVM — stays
    Files.writeString(running.resolve(s"005-livelock.json${Server.LockSuffix}"),
      ProcessHandle.current().pid().toString)
    val recovered = Server.recoverRunning(spool)
    assert(recovered === Seq("001-dead.json"))
    assert(listDir(spool, "queue") === Seq("001-dead.json"))
    assert(listDir(spool, "running").toSet ===
      Set(s"002-live.json${Server.ClaimSuffix}" +
        ProcessHandle.current().pid(), "003-orphan.json",
        s"005-livelock.json${Server.LockSuffix}"))
    // the listing surface strips the suffix and shows live claims
    assert(Server.runningTasks(spool) === Seq("002-live.json"))
  }

  test("a pid-less legacy lock releases only when aged AND its task is still queued") {
    val spool = Files.createTempDirectory("graft_conc_pidless").toString
    val running = Files.createDirectories(Paths.get(spool, "running"))
    val queue = Files.createDirectories(Paths.get(spool, "queue"))
    def age(p: java.nio.file.Path): Unit = Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - Server.PidlessLockGraceMillis - 5000))
    // crash-window artifact: lock created but pid never written, and
    // OLD enough that no live claimant can be mid-write. With no claim
    // beside it and the queue entry still present, release — else the
    // task is stranded forever while still queued.
    Files.writeString(queue.resolve("001-stranded.json"), """{"sourceDir":"/x"}""")
    Files.writeString(running.resolve(s"001-stranded.json${Server.LockSuffix}"), "")
    age(running.resolve(s"001-stranded.json${Server.LockSuffix}"))
    // pid-less lock whose queue entry is GONE: nothing provable — stays
    Files.writeString(running.resolve(s"002-unknown.json${Server.LockSuffix}"), "")
    age(running.resolve(s"002-unknown.json${Server.LockSuffix}"))
    // FRESH pid-less lock with its task queued: a live claimant may be
    // inside the open→write window this very moment — stays
    Files.writeString(queue.resolve("003-fresh.json"), """{"sourceDir":"/y"}""")
    Files.writeString(running.resolve(s"003-fresh.json${Server.LockSuffix}"), "")
    Server.recoverRunning(spool)
    assert(listDir(spool, "running").sorted ===
      Seq(s"002-unknown.json${Server.LockSuffix}",
        s"003-fresh.json${Server.LockSuffix}"))
    assert(listDir(spool, "queue").sorted ===
      Seq("001-stranded.json", "003-fresh.json"))
  }

  test("two servers recovering one dead claim concurrently: requeued once, no abort") {
    val spool = Files.createTempDirectory("graft_conc_recrace").toString
    val running = Files.createDirectories(Paths.get(spool, "running"))
    Files.createDirectories(Paths.get(spool, "queue"))
    val p = new ProcessBuilder("true").start()
    p.waitFor()
    Files.writeString(
      running.resolve(s"001-dead.json${Server.ClaimSuffix}${p.pid()}"),
      """{"sourceDir":"/x"}""")
    Files.writeString(running.resolve(s"001-dead.json${Server.LockSuffix}"),
      p.pid().toString)
    // race many rounds: both startups list running/ before either moves
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val recovered = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        try { barrier.await(); Server.recoverRunning(spool).foreach(recovered.add) }
        catch { case t: Throwable => failures.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(failures.isEmpty,
      "loser's move must not abort startup: " +
        failures.asScala.map(_.toString).mkString("\n"))
    assert(recovered.asScala.toSeq === Seq("001-dead.json"),
      "exactly one sibling reports the recovery")
    assert(listDir(spool, "queue") === Seq("001-dead.json"))
    assert(listDir(spool, "running").isEmpty)
  }

  test("a reorder racing the drain of the SAME task: exactly once, queue converges") {
    // Server.scala's reorder tolerates a racing drain per-file (parked
    // temp names are invisible to queued(); a claim winning between
    // park and finalize drops the task from the new order) — this pins
    // that argued interleaving the way the claim race was pinned.
    val (spool, targets) = mkSpool()
    val executed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val draining = new java.util.concurrent.atomic.AtomicBoolean(true)
    val drainer = new Thread(() => {
      try {
        var idle = 0
        while (idle < 3) {
          val r = Server.drainOnce(spark, spool)
          r.foreach { t => assert(t.ok, s"${t.task}: ${t.detail}"); executed.add(t.task) }
          if (r.isEmpty && listDir(spool, "queue").isEmpty) idle += 1
          Thread.sleep(25)
        }
      } catch { case t: Throwable => failures.add(t) }
      finally draining.set(false)
    })
    val reorderer = new Thread(() => {
      try {
        var front = true
        while (draining.get()) {
          // target by base name so the verb keeps finding the task
          // across renumbering; once drained, reorder returns None and
          // keeps renumbering whatever is left — both paths must stay
          // crash-free against the racing claims
          Server.reorder(spool, s"tbl${TableCount}.json", front)
          front = !front
          Thread.sleep(5)
        }
      } catch { case t: Throwable => failures.add(t) }
    })
    drainer.start(); reorderer.start()
    drainer.join(300000); reorderer.join(60000)
    assert(!drainer.isAlive && !reorderer.isAlive, "both threads finished")
    assert(failures.isEmpty, failures.asScala.map(_.toString).mkString("\n"))
    val names = executed.asScala.toSeq
    assert(names.distinct.size === names.size, s"double execution: $names")
    assert(names.size === TableCount, names.sorted.mkString(","))
    assert(listDir(spool, "done").count(_.endsWith(".json")) === TableCount)
    // deterministic convergence: nothing queued, parked, or claimed
    assert(listDir(spool, "queue").isEmpty, "no parked/queued leftovers")
    assert(listDir(spool, "running").isEmpty, "no stranded claims")
    targets.zipWithIndex.foreach { case (tgt, i) =>
      val df = spark.read.parquet(s"$tgt/restore_conc.tbl${i + 1}")
      assert(df.collect().map(_.getInt(0)).toSeq === Seq(1), tgt)
    }
  }
}
