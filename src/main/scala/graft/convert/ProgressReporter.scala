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
  *
  * Per-input bars (reference src/converter/progress.rs:5-30: one
  * indicatif bar per input under a MultiProgress): pass `inputSizes`
  * (input → on-disk bytes, <0 when unknown, e.g. a URL without
  * Content-Length) and each tick renders one bar line per STARTED
  * input — raw bytes read off that input's stream against its size —
  * after the aggregate line. With `ansi` the frame repaints in place
  * (cursor-up + erase-line); without, each tick appends plain lines
  * (what a log file or a test buffer wants — indicatif's hidden-bar
  * analogue). The tee stream always gets plain lines.
  */
final class ProgressReporter(
    metrics: WalkMetrics,
    totalInputs: Long,
    out: java.io.PrintStream,
    intervalMs: Long,
    tee: Option[java.io.PrintStream] = None,
    inputSizes: Seq[(String, Long)] = Nil,
    ansi: Boolean = false) {

  private val t0 = System.nanoTime()
  @volatile private var stopped = false
  private var prevHeight = 0 // progress-thread + stop() only

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

  /** One render frame: the aggregate line, then a bar per started
    * input, capped at [[ProgressReporter.MaxBars]] rows (a 100k-input
    * manifest must not print 100k lines per tick) with a "+N more"
    * tail. Package-visible for direct assertion in tests.
    */
  private[graft] def frame(prefix: String): Seq[String] = {
    val head = line(prefix)
    if (inputSizes.isEmpty) Seq(head)
    else {
      val read = metrics.perInputBytes.value
      val done = metrics.perInputDone.value
      val rows = inputSizes.flatMap { case (input, total) =>
        val b = read.getOrElse(input, 0L)
        val isDone = done.contains(input)
        if (b == 0L && !isDone) None // not started yet — no bar (MultiProgress adds bars lazily too)
        else {
          val name = input.substring(input.lastIndexOf('/') + 1) match {
            case "" => input
            case s  => s
          }
          val bar =
            if (isDone) "[" + "#" * 20 + "]"
            else if (total > 0) {
              val filled = math.min(20L, b * 20 / total).toInt
              "[" + "#" * filled + "-" * (20 - filled) + "]"
            } else "[" + "." * 20 + "]" // unknown length: indeterminate
          val tot = if (total > 0) f"/${total / 1e6}%.1f" else ""
          val state = if (isDone) "done" else "reading"
          Some(f"[graft]   $bar ${b / 1e6}%.1f$tot MB $state $name")
        }
      }
      val shown =
        if (rows.size <= ProgressReporter.MaxBars) rows
        else rows.take(ProgressReporter.MaxBars) :+
          s"[graft]   … +${rows.size - ProgressReporter.MaxBars} more inputs"
      head +: shown
    }
  }

  private def emit(lines: Seq[String]): Unit = {
    val sb = new StringBuilder
    if (ansi && prevHeight > 0) sb.append(s"\u001b[${prevHeight}A")
    lines.foreach { l =>
      if (ansi) sb.append("\u001b[2K")
      sb.append(l).append('\n')
    }
    out.print(sb.toString)
    out.flush()
    tee.foreach(t => lines.foreach(t.println))
    prevHeight = lines.size
  }

  private val thread = new Thread(() => {
    try {
      while (!stopped) {
        Thread.sleep(intervalMs)
        if (!stopped) emit(frame("[graft] converting:"))
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
    emit(frame("[graft] walked:"))
  }
}

object ProgressReporter {
  /** Most per-input bar rows a frame renders; beyond this a single
    * "+N more inputs" tail summarizes the rest.
    */
  val MaxBars: Int = 64
}
