package graft.convert

import graft.convert.ArchiveConverter.WalkMetrics

/** Live progress for an in-flight conversion (reference analogue:
  * src/progress.rs:11-133, which ticks an indicatif bar with the same
  * counters — entries read, bytes read, archives read).
  *
  * Driver-side only: a daemon thread polls the walk accumulators at a
  * fixed interval and prints one status line per tick. Accumulator
  * values reach the driver with task completions and executor
  * heartbeats, so the numbers trail execution by at most a heartbeat —
  * the walker's hot path never synchronizes with the reporter.
  * `stop()` prints a final line with the settled totals.
  */
final class ProgressReporter(
    metrics: WalkMetrics,
    totalInputs: Long,
    out: java.io.PrintStream,
    intervalMs: Long,
    tee: Option[java.io.PrintStream] = None) {

  private val t0 = System.nanoTime()
  @volatile private var stopped = false

  private def line(prefix: String): String = {
    val secs = (System.nanoTime() - t0) / 1e9
    val bytes = metrics.bytes.value
    val errs = metrics.errors.value
    val done = metrics.inputsDone.value
    f"$prefix inputs ${metrics.inputs.value}/$totalInputs started ($done finished), " +
      f"entries ${metrics.entries.value}%,d, ${bytes / 1e6}%.1f MB read " +
      f"(${bytes / 1e6 / math.max(secs, 1e-9)}%.1f MB/s)" +
      (if (errs > 0) s", $errs failed" else "")
  }

  private def emit(s: String): Unit = {
    out.println(s)
    tee.foreach(_.println(s))
  }

  private val thread = new Thread(() => {
    try {
      while (!stopped) {
        Thread.sleep(intervalMs)
        if (!stopped) emit(line("[graft] converting:"))
      }
    } catch { case _: InterruptedException => () }
  }, "graft-progress")
  thread.setDaemon(true)

  def start(): this.type = { thread.start(); this }

  /** Stop ticking and print the settled totals. Idempotent. */
  def stop(): Unit = if (!stopped) {
    stopped = true
    thread.interrupt()
    thread.join(1000)
    emit(line("[graft] walked:"))
  }
}
