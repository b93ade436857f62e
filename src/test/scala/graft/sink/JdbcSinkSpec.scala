package graft.sink

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, SQLException, Statement}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Drives JdbcSink against an in-JVM recording JDBC stub (dynamic
  * proxies for Connection/Statement) — no driver needed; local-mode
  * executors share the JVM, so the recorded statements are visible to
  * the assertions.
  */
object RecordingDb {
  val executed = new ConcurrentLinkedQueue[String]()
  val commits = new AtomicInteger(0)
  val failuresToInject = new AtomicInteger(0)
  val failuresSeen = new AtomicInteger(0)

  def reset(failures: Int = 0): Unit = {
    executed.clear()
    commits.set(0)
    failuresToInject.set(failures)
    failuresSeen.set(0)
  }

  private class StatementHandler extends InvocationHandler {
    private val batch = scala.collection.mutable.ArrayBuffer[String]()
    override def invoke(proxy: Object, method: Method, args: Array[Object]): Object =
      method.getName match {
        case "addBatch" => batch += args(0).asInstanceOf[String]; null
        case "clearBatch" => batch.clear(); null
        case "executeBatch" =>
          if (failuresToInject.getAndUpdate(n => math.max(0, n - 1)) > 0) {
            failuresSeen.incrementAndGet()
            throw new SQLException("injected transient failure")
          }
          batch.foreach(executed.add)
          val res = batch.map(_ => 1).toArray
          batch.clear()
          res
        case "close" => null
        case "hashCode" => Int.box(System.identityHashCode(proxy))
        case "equals" => Boolean.box(proxy eq args(0))
        case "toString" => "RecordingStatement"
        case _ => null
      }
  }

  private class ConnHandler extends InvocationHandler {
    override def invoke(proxy: Object, method: Method, args: Array[Object]): Object =
      method.getName match {
        case "createStatement" =>
          Proxy.newProxyInstance(getClass.getClassLoader,
            Array(classOf[Statement]), new StatementHandler)
        case "commit" => commits.incrementAndGet(); null
        case "setAutoCommit" | "close" | "rollback" => null
        case "hashCode" => Int.box(System.identityHashCode(proxy))
        case "equals" => Boolean.box(proxy eq args(0))
        case "toString" => "RecordingConnection"
        case _ => null
      }
  }

  def connection(): Connection =
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[Connection]), new ConnHandler).asInstanceOf[Connection]
}

case class RecordingProvider() extends ConnectionProvider {
  override def connect(): Connection = RecordingDb.connection()
}

class JdbcSinkSpec extends SparkSpec {

  test("writeRows renders multi-row INSERTs with typed literals and commits") {
    import spark.implicits._
    RecordingDb.reset()
    val df = Seq((1L, "a'b", 1.5), (2L, null, 2.5), (3L, "c", 3.5))
      .toDF("id", "v", "x").coalesce(1)
    JdbcSink.writeRows(df, "t", RecordingProvider(), rowsPerStatement = 2)
    val stmts = RecordingDb.executed.asScala.toSeq
    assert(stmts.size === 2) // 3 rows at 2/statement
    assert(stmts.forall(_.startsWith("INSERT INTO `t` (`id`,`v`,`x`) VALUES ")))
    val all = stmts.mkString("\n")
    assert(all.contains("'a\\'b'")) // escaped quote
    assert(all.contains("NULL"))
    assert(RecordingDb.commits.get() >= 1)
  }

  test("replace and ignore policies change the statement verb") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("k", "v").coalesce(1)
    RecordingDb.reset()
    JdbcSink.writeRows(df, "t", RecordingProvider(), policy = "replace")
    assert(RecordingDb.executed.asScala.head.startsWith("REPLACE INTO `t`"))
    RecordingDb.reset()
    JdbcSink.writeRows(df, "t", RecordingProvider(), policy = "ignore")
    assert(RecordingDb.executed.asScala.head.startsWith("INSERT IGNORE INTO `t`"))
  }

  test("a transient batch failure is retried and the rows still land") {
    import spark.implicits._
    RecordingDb.reset(failures = 2)
    val df = (1 to 10).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1)
    JdbcSink.writeRows(df, "t", RecordingProvider(), rowsPerStatement = 3)
    assert(RecordingDb.failuresSeen.get() === 2)
    val stmts = RecordingDb.executed.asScala.toSeq
    assert(stmts.size === 4) // 10 rows at 3/statement
    // every row value appears exactly once (retry did not duplicate)
    (1 to 10).foreach { i =>
      assert(stmts.mkString.split(s"'v$i'").length - 1 === 1)
    }
  }

  test("exhausted retries propagate the SQLException") {
    import spark.implicits._
    RecordingDb.reset(failures = 10)
    val df = Seq((1, "x")).toDF("k", "v").coalesce(1)
    val e = intercept[Exception] {
      JdbcSink.writeRows(df, "t", RecordingProvider(), maxRetries = 2)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[SQLException]))
  }
}
