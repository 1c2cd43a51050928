package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.TaskQueue
import graft.ml.TaskQueue.{Message, Status}

/** ML task-queue semantics (utilities/ml_task_queue/) — every assert is
  * transport-independent and runs against BOTH shipped transports where
  * it can: the contract is the thing under test, not the wiring. */
class MlTaskQueueSpec extends AnyFunSuite {

  private def transports(): Seq[(String, TaskQueue.Transport)] = Seq(
    "memory" -> new TaskQueue.InMemoryTransport,
    "spool" -> new TaskQueue.SpoolTransport(
      java.nio.file.Files.createTempDirectory("mlq_spec").toString))

  private def msg(key: String, payload: Map[String, String] = Map.empty) =
    Message("learn", "t1", 7L, payload, key)

  test("stream is FIFO and claim-once across competing consumers") {
    for ((name, tr) <- transports()) {
      (1 to 20).foreach(i => tr.add(msg(f"k$i%03d", Map("i" -> i.toString))))
      // two consumers race; every message is claimed exactly once, in order
      val seen = scala.collection.mutable.ArrayBuffer.empty[String]
      var turn = 0
      while (seen.size < 20 && turn < 200) {
        tr.claim("c1").foreach(m => seen += m.key)
        tr.claim("c2").foreach(m => seen += m.key)
        turn += 1
      }
      assert(seen.size === 20, s"$name: lost or duplicated claims: $seen")
      assert(seen.distinct.size === 20, s"$name: duplicate claim")
      assert(seen.toSeq === seen.toSeq.sorted, s"$name: out of order")
      assert(tr.claim("c1").isEmpty, s"$name: empty stream must miss")
    }
  }

  test("payload round-trips through the spool file, newlines and all") {
    val tr = new TaskQueue.SpoolTransport(
      java.nio.file.Files.createTempDirectory("mlq_spec").toString)
    val payload = Map(
      "fetch_data_query" -> "SELECT *\nFROM lineitem\nWHERE l_quantity > 1",
      "engine" -> "ridge", "features" -> "l_quantity,l_discount")
    tr.add(msg("kp", payload))
    val got = tr.claim("c1").get
    assert(got.payload === payload && got.tenant === "t1" && got.modelId === 7L)
  }

  test("a corrupt spool message surfaces as ERROR, not a silent loss") {
    val dir = java.nio.file.Files.createTempDirectory("mlq_spec")
    val tr = new TaskQueue.SpoolTransport(dir.toString)
    // a message the parser cannot read (truncated field list), named in
    // the stream's "<seq20>-<key>" convention so the key is recoverable
    java.nio.file.Files.writeString(
      dir.resolve("stream").resolve("0" * 20 + "-poison"), "garbage")
    tr.add(msg("kok", Map("engine" -> "ridge")))
    // claim skips the poison file but must publish its failure…
    val got = tr.claim("c1")
    assert(got.exists(_.key == "kok"), "healthy message must still be claimable")
    assert(tr.status("poison").exists(_._1 == TaskQueue.Status.Error),
      "poison message must land in ERROR status for its waiter")
    assert(tr.takeError("poison").exists(_.contains("unreadable")))
  }

  test("status lifecycle + TTL'd result, error channel, heartbeat timestamps") {
    for ((name, tr) <- transports()) {
      tr.setStatus("s1", Status.Waiting)
      val (st0, ts0) = tr.status("s1").get
      assert(st0 === Status.Waiting)
      Thread.sleep(5)
      tr.setStatus("s1", Status.Processing)
      val (st1, ts1) = tr.status("s1").get
      assert(st1 === Status.Processing && ts1 > ts0, s"$name: heartbeat ts must advance")
      // result TTL: live read returns, expired read is gone (cache.set(.., 180))
      tr.putResult("s1", "rows", ttlMs = 60000L)
      assert(tr.takeResult("s1", System.currentTimeMillis()).contains("rows"))
      tr.putResult("s2", "stale", ttlMs = 1L)
      assert(tr.takeResult("s2", System.currentTimeMillis() + 50L).isEmpty,
        s"$name: expired result must not be served")
      tr.putError("s3", "boom")
      assert(tr.takeError("s3").contains("boom") && tr.takeError("s3").isEmpty)
    }
  }

  test("runtime executes, propagates errors, and times out on a stalled heartbeat") {
    for ((name, tr) <- transports()) {
      val rt = new TaskQueue.Runtime(tr, maxConcurrent = 2)
      // happy path: Future-like blocking result
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      val t1 = rt.submit("learn", "tenant_a", Map("model" -> "m1")) { done.set(true) }
      assert(t1.result() === "ok" && done.get(), s"$name: task did not execute")
      // error path: the consumer publishes ERROR and wait() raises with the message
      val t2 = rt.submit("learn", "tenant_a", Map.empty) {
        throw new RuntimeException("train exploded") }
      val e = intercept[RuntimeException](t2.result())
      assert(e.getMessage.contains("train exploded"), s"$name: $e")
      // timeout path: a task nobody will ever claim (status stays WAITING,
      // no heartbeat) trips the watchdog — task.py _timeout semantics
      val orphan = new TaskQueue.Task(tr, "no-such-task", timeoutMs = 150L)
      val to = intercept[RuntimeException](orphan.result())
      assert(to.getMessage.contains("Can't get answer"), s"$name: $to")
      // unknown task type refused at submit (const.py ML_TASK_TYPE)
      intercept[IllegalArgumentException](rt.submit("bake", "t", Map.empty) { () })
      rt match { case _ => () }
    }
  }

  test("SET ml_task_queue routes CREATE MODEL through the queue end-to-end") {
    val spark = graft.engine.Session.build("mlq-spec")
    val c = new graft.sqlx.Commands(spark,
      new graft.catalog.Catalog(spark, "/root/testdata/sf0.001"),
      graft.catalog.Warehouse.temp(spark))
    c.execute("SET ml_task_queue = 'spool'")
    // the same CREATE MODEL the direct path serves — now queue-mediated
    c.execute("""CREATE MODEL mlq_m FROM (SELECT l_quantity, l_extendedprice FROM lineitem)
      PREDICT l_extendedprice USING engine='ridge', features='l_quantity', lambda='0.5'""")
    assert(c.catalog.listModels().contains("mlq_m"))
    val scored = c.execute(
      "SELECT l_quantity, score FROM lineitem JOIN mlq_m LIMIT 5").collect()
    assert(scored.length === 5 && !scored.head.isNullAt(1))
    // a failing trainer surfaces its error through the queue, synchronously
    val err = intercept[Exception](c.execute(
      """CREATE MODEL mlq_bad FROM (SELECT no_such_col FROM lineitem)
         PREDICT no_such_col USING engine='ridge', features='no_such_col'"""))
    assert(!c.catalog.listModels().contains("mlq_bad"))
    c.execute("SET ml_task_queue = 'off'")
    c.execute("DROP MODEL mlq_m")
  }
}
