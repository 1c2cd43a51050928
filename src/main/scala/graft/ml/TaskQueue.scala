package graft.ml

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.concurrent.TrieMap

/** ML task queue — the reference's `utilities/ml_task_queue/`
  * (producer.py, consumer.py, task.py, const.py, utils.py) re-expressed
  * for the JVM. The executor seam (`ml_exec_base.py:73`) swaps the
  * in-process executor for a queue producer when the queue is
  * configured; learn/predict work then flows: producer appends a task
  * descriptor to a stream → a consumer claims it (consumer-group
  * at-most-once), executes, heartbeats PROCESSING, and publishes
  * COMPLETE/ERROR with a TTL'd result — while the caller holds a
  * Future-like [[TaskQueue.Task]] whose `wait` times out when the
  * heartbeat stalls (task.py `_timeout = 60`).
  *
  * Spark-first divergence (deliberate): the reference ships the actual
  * training DataFrame through the Redis cache (producer.py:74,
  * `cache.set(redis_key.dataframe, to_bytes(dataframe), 180)`). On
  * Spark the frame is distributed — pushing it through a coordination
  * channel would serialize the corpus through one socket. Tasks here
  * carry the DATA QUERY (the reference's own `fetch_data_query` field,
  * ml_exec_base.py:83) and the consumer re-binds it on the shared
  * SparkSession: the queue coordinates, Spark moves data. At 100 TB the
  * queue payload stays bytes-sized no matter the training set.
  *
  * The reference's transport is Redis streams — env-blocked here (zero
  * egress, no server). The transport is therefore the five-call
  * [[TaskQueue.Transport]] interface with two shipped implementations:
  *
  *  - [[TaskQueue.InMemoryTransport]] — single-JVM lock-free queues.
  *  - [[TaskQueue.SpoolTransport]] — a spool directory with ATOMIC
  *    RENAMES: a message is one file; a consumer claims it by renaming
  *    it into its own claim dir (rename is atomic on POSIX, so exactly
  *    one consumer wins — the consumer-group contract without a
  *    server); status/result/error are TTL-stamped sibling files. This
  *    is the multi-process single-node transport, crash-visible on
  *    disk.
  *
  * A Redis transport would be a third implementation of the same five
  * calls; every semantic this file tests (FIFO order, claim-once,
  * status lifecycle, heartbeat timeout, result TTL, tenant propagation,
  * resource gating) is transport-independent.
  */
object TaskQueue {

  /** const.py ML_TASK_TYPE */
  val TaskTypes: Set[String] = Set("learn", "predict", "finetune", "describe",
    "create_validation", "create_engine", "update_engine", "update", "func_call")
  /** const.py ML_TASK_STATUS */
  object Status {
    val Waiting = "waiting"; val Processing = "processing"
    val Complete = "complete"; val Error = "error"; val Timeout = "timeout"
  }

  /** One queued task: the stream message of producer.py:62-70 (task
    * type, tenant/company, model id, payload, key) — payload is a flat
    * string map (the SQL text + problem definition), never row data. */
  final case class Message(taskType: String, tenant: String, modelId: Long,
      payload: Map[String, String], key: String)

  /** Five-call transport seam (redis stream + cache + pubsub in the
    * reference). Status entries carry their last-update timestamp — the
    * heartbeat the Task watchdog reads. */
  trait Transport {
    def add(msg: Message): Unit
    /** claim-once: at most one claimer ever sees a given message. */
    def claim(consumer: String): Option[Message]
    def setStatus(key: String, status: String): Unit
    /** (status, lastUpdateMillis) */
    def status(key: String): Option[(String, Long)]
    def putResult(key: String, rows: String, ttlMs: Long): Unit
    def takeResult(key: String, now: Long): Option[String]
    def putError(key: String, message: String): Unit
    def takeError(key: String): Option[String]
  }

  final class InMemoryTransport extends Transport {
    private val stream = new ConcurrentLinkedQueue[Message]()
    private val statuses = TrieMap.empty[String, (String, Long)]
    private val results = TrieMap.empty[String, (String, Long)] // value, expiry
    private val errors = TrieMap.empty[String, String]
    def add(msg: Message): Unit = stream.add(msg)
    def claim(consumer: String): Option[Message] = Option(stream.poll())
    def setStatus(key: String, status: String): Unit =
      statuses(key) = (status, System.currentTimeMillis())
    def status(key: String): Option[(String, Long)] = statuses.get(key)
    def putResult(key: String, rows: String, ttlMs: Long): Unit =
      results(key) = (rows, System.currentTimeMillis() + ttlMs)
    def takeResult(key: String, now: Long): Option[String] =
      results.remove(key).collect { case (v, exp) if now <= exp => v }
    def putError(key: String, message: String): Unit = errors(key) = message
    def takeError(key: String): Option[String] = errors.remove(key)
  }

  /** Spool-directory transport. Layout under `dir`:
    *   stream/<seq>-<key>          queued message (JSON lines of fields)
    *   claims/<consumer>/<file>    claimed message (atomic rename target)
    *   state/<key>.status          "<status>\t<millis>"
    *   state/<key>.result          "<expiryMillis>\n<rows>"
    *   state/<key>.error           message
    * The claim is `Files.move(src, dst, ATOMIC_MOVE)`: exactly one
    * consumer's rename succeeds (the others get the miss and re-scan) —
    * the same at-most-once delivery a Redis consumer-group ack gives. */
  final class SpoolTransport(dir: String) extends Transport {
    private val root = Paths.get(dir)
    private val stream = root.resolve("stream")
    private val claims = root.resolve("claims")
    private val state = root.resolve("state")
    Seq(stream, claims, state).foreach(Files.createDirectories(_))
    private val seq = new AtomicLong(System.currentTimeMillis())

    private def writeAtomic(target: Path, content: String): Unit = {
      val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
      Files.writeString(tmp, content, UTF_8)
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }

    // record/unit separators (payload values may hold SQL with newlines)
    private val RS = "\u001e"; private val US = "\u001f"

    def add(msg: Message): Unit = {
      val body = (Seq(msg.taskType, msg.tenant, msg.modelId.toString, msg.key) ++
        msg.payload.toSeq.sortBy(_._1).map { case (k, v) =>
          k + US + v }).mkString(RS)
      writeAtomic(stream.resolve(f"${seq.incrementAndGet()}%020d-${msg.key}"), body)
    }

    private def parse(body: String): Message = {
      val parts = body.split(RS, -1)
      Message(parts(0), parts(1), parts(2).toLong,
        parts.drop(4).filter(_.nonEmpty).map { kv =>
          val Array(k, v) = kv.split(US, 2); k -> v }.toMap, parts(3))
    }

    def claim(consumer: String): Option[Message] = {
      val mine = claims.resolve(consumer)
      Files.createDirectories(mine)
      val files = {
        val s = Files.list(stream)
        try s.toArray.toSeq.map(_.asInstanceOf[Path])
          .filterNot(_.getFileName.toString.endsWith(".tmp"))
          .sortBy(_.getFileName.toString)
        finally s.close()
      }
      files.iterator.flatMap { f =>
        val dst = mine.resolve(f.getFileName.toString)
        // ONLY the rename race is a silent miss. A failure AFTER the
        // ATOMIC_MOVE succeeded (read/parse) must not be swallowed —
        // that stranded the claimed file in the claim dir and wedged the
        // waiter until heartbeat timeout. Publish ERROR for the key
        // (recovered from the "<seq20>-<key>" filename) so the producer
        // fails fast instead.
        val moved =
          try { Files.move(f, dst, StandardCopyOption.ATOMIC_MOVE); true }
          catch { case _: Exception => false } // lost the race — next file
        if (!moved) None
        else try {
          val m = parse(Files.readString(dst, UTF_8))
          Files.delete(dst) // ack+delete (consumer.py:166-167)
          Some(m)
        } catch {
          case e: Exception =>
            val key = f.getFileName.toString.drop(21)
            try {
              putError(key, "claimed message unreadable: " +
                Option(e.getMessage).getOrElse(e.getClass.getName))
              setStatus(key, Status.Error)
              Files.deleteIfExists(dst)
            } catch { case _: Exception => () }
            None
        }
      }.take(1).toSeq.headOption
    }

    def setStatus(key: String, status: String): Unit =
      writeAtomic(state.resolve(s"$key.status"),
        status + "\t" + System.currentTimeMillis())
    def status(key: String): Option[(String, Long)] = {
      val p = state.resolve(s"$key.status")
      if (!Files.exists(p)) None
      else Files.readString(p, UTF_8).split("\t", 2) match {
        case Array(s, ts) => Some((s, ts.toLong))
        case _ => None
      }
    }
    def putResult(key: String, rows: String, ttlMs: Long): Unit =
      writeAtomic(state.resolve(s"$key.result"),
        (System.currentTimeMillis() + ttlMs).toString + "\n" + rows)
    def takeResult(key: String, now: Long): Option[String] = {
      val p = state.resolve(s"$key.result")
      if (!Files.exists(p)) None
      else {
        val body = Files.readString(p, UTF_8)
        try Files.delete(p) catch { case _: Exception => () }
        val i = body.indexOf('\n')
        if (i < 0 || now > body.substring(0, i).toLong) None
        else Some(body.substring(i + 1))
      }
    }
    def putError(key: String, message: String): Unit =
      writeAtomic(state.resolve(s"$key.error"), message)
    def takeError(key: String): Option[String] = {
      val p = state.resolve(s"$key.error")
      if (!Files.exists(p)) None
      else { val m = Files.readString(p, UTF_8)
        try Files.delete(p) catch { case _: Exception => () }; Some(m) }
    }
  }

  /** Future-like task handle (task.py Task: subscribe/wait/result).
    * `waitDone` polls the status channel; the timeout is measured from
    * the LAST STATUS UPDATE (the heartbeat), not from submission — a
    * long-running task that heartbeats never times out, a wedged
    * consumer does (task.py `_timeout = 60` against StatusNotifier's
    * 5 s refresh). */
  final class Task(transport: Transport, val key: String,
      timeoutMs: Long = 60000L, pollMs: Long = 20L) {
    def statusNow: String =
      transport.status(key).map(_._1).getOrElse(Status.Waiting)
    /** Block until COMPLETE (returning the result payload), raise on
      * ERROR, raise on heartbeat-stalled TIMEOUT. */
    def result(): String = {
      var last = System.currentTimeMillis()
      while (true) {
        transport.status(key) match {
          case Some((Status.Complete, _)) =>
            return transport.takeResult(key, System.currentTimeMillis()).getOrElse("")
          case Some((Status.Error, _)) =>
            throw new RuntimeException(
              transport.takeError(key).getOrElse("Unknown error during ML task execution"))
          case Some((_, ts)) => last = math.max(last, ts)
          case None => ()
        }
        if (System.currentTimeMillis() - last > timeoutMs)
          throw new RuntimeException(
            s"Can't get answer in ${timeoutMs / 1000} seconds")
        Thread.sleep(pollMs)
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** producer.py MLTaskProducer.apply_async: enqueue + WAITING status. */
  final class Producer(transport: Transport) {
    private val n = new AtomicLong(0)
    def applyAsync(taskType: String, tenant: String, modelId: Long,
        payload: Map[String, String], timeoutMs: Long = 60000L): Task = {
      require(TaskTypes.contains(taskType), s"unknown task type: $taskType")
      val key = s"${System.currentTimeMillis()}${n.incrementAndGet()}-$tenant-$modelId"
      transport.setStatus(key, Status.Waiting)
      transport.add(Message(taskType, tenant, modelId, payload, key))
      new Task(transport, key, timeoutMs)
    }
  }

  /** consumer.py MLTaskConsumer: claim → execute (the registered
    * handler, the process_cache analog) → heartbeat PROCESSING →
    * COMPLETE/ERROR. Concurrency is gated at `maxConcurrent` (the
    * reference gates at cores/8 and 60% CPU — the task-count gate is
    * the deterministic part, wait_free_resources consumer.py:120-138). */
  final class Consumer(transport: Transport, name: String,
      handler: Message => String,
      maxConcurrent: Int =
        math.max(1, java.lang.Runtime.getRuntime.availableProcessors() / 8),
      heartbeatMs: Long = 1000L) {
    private val stop = new AtomicBoolean(false)
    private val running = new AtomicLong(0)
    @volatile private var threads = List.empty[Thread]

    def runningTasks: Long = running.get()

    private def executeOne(msg: Message): Unit = {
      // `running` is already reserved by the LISTENER thread before this
      // worker spawns — incrementing here instead raced the gate check:
      // a backlog could spawn unbounded workers before any increment
      // became visible (the wait_free_resources analog was unenforced).
      transport.setStatus(msg.key, Status.Processing)
      // the heartbeat is stopped AND joined before the terminal status
      // is written — otherwise a sleeping beat could wake after COMPLETE
      // and overwrite it with PROCESSING, wedging the waiter forever
      val hbStop = new AtomicBoolean(false)
      val beat = new Thread(() => {
        try {
          while (!hbStop.get() && !stop.get()) {
            transport.setStatus(msg.key, Status.Processing)
            Thread.sleep(heartbeatMs)
          }
        } catch { case _: InterruptedException => () }
      }, s"taskqueue-$name-heartbeat")
      beat.setDaemon(true); beat.start()
      val outcome = try Right(handler(msg)) catch { case e: Exception => Left(e) }
      hbStop.set(true); beat.interrupt(); beat.join()
      outcome match {
        case Right(out) =>
          transport.putResult(msg.key, out, ttlMs = 180000L)
          transport.setStatus(msg.key, Status.Complete)
        case Left(e) =>
          transport.putError(msg.key,
            Option(e.getMessage).getOrElse(e.toString))
          transport.setStatus(msg.key, Status.Error)
      }
      running.decrementAndGet()
    }

    def start(): Unit = {
      val t = new Thread(() => {
        while (!stop.get()) {
          if (running.get() < maxConcurrent) {
            transport.claim(name) match {
              case Some(msg) =>
                // reserve the slot ON THIS THREAD before spawning, so the
                // gate check and the reservation are not separated by a
                // scheduling gap (decrement on spawn failure)
                running.incrementAndGet()
                try {
                  val w = new Thread(() => executeOne(msg), s"taskqueue-$name-exec")
                  w.setDaemon(true); w.start()
                } catch { case e: Throwable => running.decrementAndGet(); throw e }
              case None => Thread.sleep(20L)
            }
          } else Thread.sleep(20L)
        }
      }, s"taskqueue-$name-listen")
      t.setDaemon(true); t.start()
      threads ::= t
    }

    def shutdown(): Unit = { stop.set(true) }
  }

  /** Engine-side runtime: one consumer over one transport, executing
    * closures registered at submit time (the `process_cache.apply_async`
    * analog, consumer.py:189). The queue message still carries the FULL
    * task descriptor (fetch_data_query + params), so a remote consumer
    * could execute from the descriptor alone; the closure registry is
    * the single-JVM fast path — exactly the split the reference has
    * between its stream message and the process-cache callable. */
  final class Runtime(val transport: Transport, maxConcurrent: Int = 2) {
    private val closures = TrieMap.empty[String, () => Unit]
    private val n = new AtomicLong(0)
    private val consumer = new Consumer(transport, "ml_executor", msg =>
      closures.remove(msg.key) match {
        case Some(f) => f(); "ok"
        case None => throw new IllegalStateException(
          s"no executor registered for task ${msg.key}")
      }, maxConcurrent)
    consumer.start()

    def submit(taskType: String, tenant: String,
        payload: Map[String, String], timeoutMs: Long = 60000L)
        (f: => Unit): Task = {
      require(TaskTypes.contains(taskType), s"unknown task type: $taskType")
      val key = s"${System.currentTimeMillis()}${n.incrementAndGet()}-$tenant"
      closures(key) = () => f
      transport.setStatus(key, Status.Waiting)
      transport.add(Message(taskType, tenant, 0L, payload, key))
      new Task(transport, key, timeoutMs)
    }
  }
}
