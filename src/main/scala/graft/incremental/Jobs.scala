package graft.incremental

import java.time.{Duration, Instant}
import scala.collection.mutable

/** Job scheduler (SURVEY §2.11; reference
  * interfaces/jobs/jobs_controller.py:104-233, schedule parser
  * calc_next_date :34-71, executor JobsExecutor :356-441, polling daemon
  * interfaces/jobs/scheduler.py ~30 s tick).
  *
  * `EVERY n unit` schedules with optional start/end bounds and an IF
  * condition gate. The clock is injected so specs drive time
  * deterministically; a production deployment calls [[Jobs.tick]] from
  * any external timer (the reference's daemon loop).
  */
object Jobs {

  /** Parse "every [n] unit" → duration (calc_next_date :34-71).
    * Months follow the reference's relativedelta(months=n) calendar
    * semantics via [[nextDate]]. */
  def parseSchedule(s: String): Either[Int, Duration] = {
    val str = s.toLowerCase.trim
    require(str.startsWith("every "), s"Schedule must start with EVERY: $s")
    val items = str.stripPrefix("every ").trim.split("\\s+")
    val (value, period) = items match {
      case Array(p) => (1, p)
      case Array(v, p) =>
        require(v.forall(_.isDigit), s"Number expected: $v"); (v.toInt, p)
      case _ => throw new IllegalArgumentException(s"Can't parse repeat string: $s")
    }
    period match {
      case "minute" | "minutes" | "min" => Right(Duration.ofMinutes(value))
      case "hour" | "hours" => Right(Duration.ofHours(value))
      case "day" | "days" => Right(Duration.ofDays(value))
      case "week" | "weeks" => Right(Duration.ofDays(value * 7L))
      case "month" | "months" => Left(value) // calendar months
      case other => throw new IllegalArgumentException(s"Unknown period: $other")
    }
  }

  def nextDate(schedule: String, base: Instant): Instant =
    parseSchedule(schedule) match {
      case Right(d) => base.plus(d)
      case Left(months) =>
        java.time.ZonedDateTime.ofInstant(base, java.time.ZoneOffset.UTC)
          .plusMonths(months.toLong).toInstant
    }

  final case class JobRun(job: String, at: Instant, ok: Boolean, error: Option[String])

  final case class Job(
      name: String,
      schedule: String,
      task: () => Unit,
      ifCondition: () => Boolean = () => true,
      start: Option[Instant] = None,
      end: Option[Instant] = None,
      /** source texts for the REST/meta surface (jobs_controller.get
        * returns query/if_query verbatim); empty for programmatic jobs. */
      queryText: String = "",
      ifQueryText: String = "") {
    var nextRun: Instant = start.getOrElse(Instant.EPOCH)
    var active: Boolean = true
    /** assigned by [[Jobs.create]]; the reference's integer record id. */
    var id: Long = 0L
  }
}

final class Jobs {
  import Jobs._
  private val jobs = mutable.LinkedHashMap[String, Job]()
  private val ids = new java.util.concurrent.atomic.AtomicLong(0L)
  val history: mutable.ArrayBuffer[JobRun] = mutable.ArrayBuffer.empty
  /** retention bound: a long-lived server with a frequent job must not
    * grow history (and the linear lastRunAt/historyOf scans over it)
    * without bound — the reference stores runs in a DB table, this
    * in-memory store keeps the newest runs per job. */
  private val maxRunsPerJob = 200
  /** hard cap on TOTAL retained runs (many short-lived distinct job
    * names would otherwise dodge the per-name cap). */
  private val maxTotalRuns = 10000
  /** compaction floor: re-compact only after history doubles past the
    * last compacted size — amortized O(1), never an every-tick rebuild
    * when the per-name cap has nothing left to evict. */
  private var compactFloor = 0

  def create(job: Job): Unit = synchronized {
    parseSchedule(job.schedule) // validate eagerly, like CREATE JOB does
    // job names are case-insensitive like every reference object name
    // (tests/unit/executor/test_lowercase.py test_job_name_lowercase)
    val j = job.copy(name = job.name.toLowerCase)
    j.id = ids.incrementAndGet()
    jobs(j.name) = j
  }
  def drop(name: String): Unit = synchronized { jobs.remove(name.toLowerCase) }
  def list(): Seq[Job] = synchronized { jobs.values.toSeq }
  def get(name: String): Option[Job] = synchronized { jobs.get(name.toLowerCase) }
  /** last completed run instant, from history (REST `last_run_at`). */
  def lastRunAt(name: String): Option[Instant] = synchronized {
    history.reverseIterator.find(_.job == name.toLowerCase).map(_.at)
  }
  /** snapshot of one job's run history (REST history route) — the
    * daemon appends concurrently, so readers MUST come through here. */
  def historyOf(name: String): Seq[JobRun] = synchronized {
    history.filter(_.job == name.toLowerCase).toSeq
  }
  def hasHistory(name: String): Boolean = synchronized {
    history.exists(_.job == name.toLowerCase)
  }

  /** Serializes ticks WITHOUT holding the Jobs monitor: a job's task/IF
    * runs SQL, which takes Commands.analysisLock, while meta-table
    * queries hold analysisLock and call the synchronized list()/
    * lastRunAt() here — holding the monitor across task execution would
    * be an AB-BA deadlock (daemon: Jobs→analysisLock; session:
    * analysisLock→Jobs). Tasks therefore run lock-free between short
    * monitor-held state reads/writes. */
  private val tickLock = new Object

  /** One scheduler tick (the daemon loop body): run every due job whose
    * IF condition holds, record history, advance next_run. A job past
    * its end date deactivates (jobs_controller deletion semantics). */
  def tick(now: Instant): Seq[JobRun] = tickLock.synchronized {
    val due = synchronized {
      jobs.values.toSeq.filter(j => j.active && !j.nextRun.isAfter(now))
    }
    val ran = due.map { j =>
      // task/ifCondition run OUTSIDE the Jobs monitor (see tickLock)
      val run =
        if (j.end.exists(_.isBefore(now))) {
          synchronized { j.active = false }
          JobRun(j.name, now, ok = true, Some("expired"))
        }
        else if (!j.ifCondition()) JobRun(j.name, now, ok = true, Some("skipped-if"))
        else try { j.task(); JobRun(j.name, now, ok = true, None) }
        catch { case e: Exception => JobRun(j.name, now, ok = false, Some(e.getMessage)) }
      synchronized {
        // schedule strictly beyond `now` even after missed ticks
        while (!j.nextRun.isAfter(now)) {
          j.nextRun = nextDate(j.schedule,
            if (j.nextRun == Instant.EPOCH) now else j.nextRun)
        }
      }
      run
    }
    synchronized {
      history ++= ran.filter(r => r.error.forall(_ != "expired"))
      // amortized compaction: trigger only past BOTH the size budget
      // and 2× the last compacted size, keep the newest maxRunsPerJob
      // runs per job name then the newest maxTotalRuns overall (order
      // otherwise preserved)
      if (history.length > math.max(2 * maxRunsPerJob * math.max(1, jobs.size),
          2 * compactFloor)) {
        val keep = history.zipWithIndex.groupBy(_._1.job).valuesIterator
          .flatMap(_.takeRight(maxRunsPerJob)).toArray.sortBy(_._2).map(_._1)
          .takeRight(maxTotalRuns)
        history.clear(); history ++= keep
        compactFloor = history.length
      }
    }
    ran
  }
}

/** In-process scheduler daemon (reference interfaces/jobs/scheduler.py:
  * a ~30 s polling loop calling check_timetable). The clock is injected
  * so specs advance time deterministically; [[kick]] forces one
  * immediate tick and blocks until it completes, so tests never sleep.
  * The thread is a daemon: an un-stopped scheduler can't pin the JVM
  * (same rule as the server pools — see verify-skill gotchas).
  */
final class JobsDaemon(stores: () => Seq[Jobs],
    clock: () => Instant = () => Instant.now(),
    periodMillis: Long = 30000L) {

  /** single-store daemon (the pre-tenancy shape; specs use this). */
  def this(jobs: Jobs, clock: () => Instant, periodMillis: Long) =
    this(() => Seq(jobs), clock, periodMillis)
  def this(jobs: Jobs) = this(() => Seq(jobs))
  private val wake =
    new java.util.concurrent.LinkedBlockingQueue[java.util.concurrent.CountDownLatch]()
  @volatile private var running = false
  private val thread = new Thread(() => {
    while (running) {
      val latch =
        try wake.poll(periodMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
        catch { case _: InterruptedException => null }
      if (running) {
        // every store ticks (the reference scheduler checks ALL
        // companies' jobs each pass — a tenant-created job must run
        // even though only the default store existed at daemon start)
        stores().foreach { js =>
          try js.tick(clock())
          catch { case e: Throwable => System.err.println(s"[jobs-daemon] tick: $e") }
        }
      }
      if (latch != null) latch.countDown()
    }
  }, "graft-jobs-daemon")
  thread.setDaemon(true)

  def start(): JobsDaemon = { running = true; thread.start(); this }
  def stop(): Unit = {
    running = false
    wake.offer(new java.util.concurrent.CountDownLatch(0)) // unblock poll
    thread.interrupt()
  }
  /** Force one tick ON THE DAEMON THREAD and wait for it — the spec hook
    * and the on-demand trigger (reference scheduler wakes early when a
    * job is created). */
  def kick(): Unit = {
    val latch = new java.util.concurrent.CountDownLatch(1)
    wake.put(latch)
    latch.await(30, java.util.concurrent.TimeUnit.SECONDS)
  }
}
