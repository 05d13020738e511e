package graft.engine

import java.time.{Duration, LocalDateTime}

/** O2/O3 driver-side scheduling (scheduler.py:228-267): one-shot at a
  * configured datetime (past time → run immediately) and every-N-minutes
  * recurrence. Pure timing math plus a pluggable sleep so tests run
  * without real waiting; production streaming workloads should prefer
  * Trigger.ProcessingTime on graft.streaming.IncrementalStream instead
  * (SURVEY.md §2.7).
  */
object Scheduler {

  /** Delay until a one-shot run: zero when the time already passed
    * (scheduler.py:240-244 "past time → run now").
    */
  def delayUntil(scheduled: LocalDateTime, now: LocalDateTime): Duration = {
    val d = Duration.between(now, scheduled)
    if (d.isNegative) Duration.ZERO else d
  }

  /** O2 one-shot: sleep until the scheduled time, then run. */
  def runOnce[A](scheduled: LocalDateTime,
                 now: () => LocalDateTime = () => LocalDateTime.now(),
                 sleep: Duration => Unit = d => Thread.sleep(d.toMillis))
                (job: () => A): A = {
    val d = delayUntil(scheduled, now())
    if (!d.isZero) sleep(d)
    job()
  }

  /** O3 recurring: run every `minutes`, `times` iterations (None = forever,
    * like scheduler.py's while-True loop; tests pass a small count).
    *
    * The FIRST run fires after one full interval, not immediately:
    * `schedule.every(minutes).minutes.do(...)` (scheduler.py:258-263)
    * sets next_run = now + interval, so a job scheduled at 23:50
    * "Every 60" first runs after midnight — an immediate t=0 run would
    * execute one extra, earlier iteration against not-yet-ready inputs
    * (code-review r14).
    */
  def runEvery(minutes: Long, times: Option[Int] = None,
               sleep: Duration => Unit = d => Thread.sleep(d.toMillis))
              (job: () => Unit): Unit = {
    // minutes = 0 hot-looped the job back-to-back forever; negative
    // threw from Thread.sleep
    require(minutes > 0, s"interval must be positive minutes, got $minutes")
    var i = 0
    while (times.forall(i < _)) {
      sleep(Duration.ofMinutes(minutes))
      job()
      i += 1
    }
  }
}
