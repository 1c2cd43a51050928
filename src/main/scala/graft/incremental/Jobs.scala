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
      end: Option[Instant] = None) {
    var nextRun: Instant = start.getOrElse(Instant.EPOCH)
    var active: Boolean = true
  }
}

final class Jobs {
  import Jobs._
  private val jobs = mutable.LinkedHashMap[String, Job]()
  val history: mutable.ArrayBuffer[JobRun] = mutable.ArrayBuffer.empty

  def create(job: Job): Unit = {
    parseSchedule(job.schedule) // validate eagerly, like CREATE JOB does
    // job names are case-insensitive like every reference object name
    // (tests/unit/executor/test_lowercase.py test_job_name_lowercase)
    jobs(job.name.toLowerCase) = job.copy(name = job.name.toLowerCase)
  }
  def drop(name: String): Unit = jobs.remove(name.toLowerCase)
  def list(): Seq[Job] = jobs.values.toSeq

  /** One scheduler tick (the daemon loop body): run every due job whose
    * IF condition holds, record history, advance next_run. A job past
    * its end date deactivates (jobs_controller deletion semantics). */
  def tick(now: Instant): Seq[JobRun] = {
    val ran = jobs.values.toSeq.filter(j => j.active && !j.nextRun.isAfter(now)).map { j =>
      val run =
        if (j.end.exists(_.isBefore(now))) { j.active = false; JobRun(j.name, now, ok = true, Some("expired")) }
        else if (!j.ifCondition()) JobRun(j.name, now, ok = true, Some("skipped-if"))
        else try { j.task(); JobRun(j.name, now, ok = true, None) }
        catch { case e: Exception => JobRun(j.name, now, ok = false, Some(e.getMessage)) }
      // schedule strictly beyond `now` even after missed ticks
      while (!j.nextRun.isAfter(now)) {
        j.nextRun = nextDate(j.schedule,
          if (j.nextRun == Instant.EPOCH) now else j.nextRun)
      }
      run
    }
    history ++= ran.filter(r => r.error.forall(_ != "expired"))
    ran
  }
}
