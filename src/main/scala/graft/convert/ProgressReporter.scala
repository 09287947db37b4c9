package graft.convert

import graft.convert.ArchiveConverter.WalkMetrics

/** Live progress for an in-flight conversion (reference analogue:
  * src/progress.rs:11-133, which ticks an indicatif bar with the same
  * counters — entries read, bytes read, archives read).
  *
  * Driver-side only: a daemon thread polls the walk counters at a
  * fixed interval and prints one status line per tick. With a `live`
  * view ([[ArchiveConverter.LiveWalkCounters]]) the numbers trail
  * execution by at most a heartbeat (running-task partials merged in);
  * without it they advance only as tasks complete (bare
  * `AccumulatorV2.value` semantics). The walker's hot path never
  * synchronizes with the reporter. `stop()` prints a final line with
  * the settled totals.
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
    ansi: Boolean = false,
    live: Option[ArchiveConverter.LiveWalkCounters] = None) {

  private val t0 = System.nanoTime()
  @volatile private var stopped = false
  private var prevHeight = 0 // progress-thread + stop() only

  // read through the live view when present: bare AccumulatorV2.value
  // only advances at task completion, freezing mid-task progress
  private def readLong(acc: org.apache.spark.util.LongAccumulator): Long =
    live.map(_.longValue(acc)).getOrElse(acc.value)
  private def readMap(acc: ArchiveConverter.MapAccumulator): Map[String, Long] =
    live.map(_.mapValue(acc)).getOrElse(acc.value)

  private def line(prefix: String): String = {
    val secs = (System.nanoTime() - t0) / 1e9
    val bytes = readLong(metrics.bytes)
    val errs = readLong(metrics.errors)
    val done = readLong(metrics.inputsDone)
    f"$prefix inputs ${readLong(metrics.inputs)}/$totalInputs started ($done finished), " +
      f"entries ${readLong(metrics.entries)}%,d, ${bytes / 1e6}%.1f MB read " +
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
      val read = readMap(metrics.perInputBytes)
      val done = readMap(metrics.perInputDone)
      // per-tick work is O(started) + a capped render, not O(inputs):
      // the expensive formatting runs for at most MaxBars rows, and
      // the "+N more" count comes from the accumulator key sets
      val startedCount = (read.keySet ++ done.keySet).size
      val rows = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = inputSizes.iterator
      while (it.hasNext && rows.size < ProgressReporter.MaxBars) {
        val (input, total) = it.next()
        val b = read.getOrElse(input, 0L)
        val isDone = done.contains(input)
        // not started yet — no bar (MultiProgress adds bars lazily too)
        if (b > 0L || isDone) {
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
          rows += f"[graft]   $bar ${b / 1e6}%.1f$tot MB $state $name"
        }
      }
      val more = startedCount - rows.size
      val shown =
        if (more <= 0) rows.toSeq
        else rows.toSeq :+ s"[graft]   … +$more more inputs"
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

  /** Best-effort "is the process's STDERR a terminal" — the stream the
    * bars repaint. `System.console()` reflects stdin/stdout, so
    * `cmd 2>log` would wrongly ANSI-paint the log through it; on Linux
    * the `/proc/self/fd/2` symlink answers for the actual fd
    * (indicatif isattys the same fd). Non-Linux falls back to
    * `System.console()`.
    */
  def stderrIsTty: Boolean =
    try {
      val p = java.nio.file.Paths.get("/proc/self/fd/2")
      if (java.nio.file.Files.isSymbolicLink(p)) {
        val target = java.nio.file.Files.readSymbolicLink(p).toString
        target.startsWith("/dev/pts/") || target == "/dev/tty" ||
          target.startsWith("/dev/console")
      } else System.console() != null
    } catch { case _: Throwable => System.console() != null }
}
