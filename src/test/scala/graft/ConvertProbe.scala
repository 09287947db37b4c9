package graft

import graft.core.ConvertOptions
import graft.walk.ArchiveWalker

/** Manual converter perf probe without Spark: times the raw walker on
  * one input to isolate walk cost from Spark overhead.
  * Run: sbt "Test/runMain graft.ConvertProbe <input>"
  */
object ConvertProbe {
  def main(args: Array[String]): Unit = {
    val input = args(0)
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      var rows = 0L
      var bytes = 0L
      val it = ArchiveWalker.walkInput(input, ConvertOptions())
      while (it.hasNext) { val e = it.next(); rows += 1; bytes += e.size }
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[cprobe] rep$rep rows=$rows bytes=$bytes secs=$secs%.2f mbps=${bytes / 1e6 / secs}%.1f")
    }
  }
}
