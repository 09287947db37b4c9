package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round instrumentation (guide §1: measure first).
  *
  * For each named query (args, or all when none given):
  *   - one warm pass on the warm dir (JIT/codegen),
  *   - a timed pass on SPARK_GRAFT_SF_DIR with a listener counting
  *     jobs / stages / tasks / shuffle bytes — the fixed-overhead
  *     profile that dominates local sf0.1 timings,
  *   - `.explain("formatted")` written to
  *     plans/<SPARK_GRAFT_PLAN_TAG>/<query>_<suffix>.txt
  *     (suffix via SPARK_GRAFT_PLAN_SUFFIX, default "before").
  *
  * Not part of the driver contract — a measurement harness only.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r21")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val wantPlans = sys.env.get("SPARK_GRAFT_PLANS").forall(_ == "1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val verbose = sys.env.get("SPARK_GRAFT_PROBE_VERBOSE").contains("1")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shuffleRead = new AtomicLong(0L)
    val shuffleWrite = new AtomicLong(0L)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) jobStarts.put(js.jobId, (js.time,
          Option(js.properties.getProperty("callSite.short")).getOrElse("?")))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (verbose) Option(jobStarts.remove(je.jobId)).foreach { case (t0, site) =>
          println(f"  job ${je.jobId}%4d ${(je.time - t0) / 1e3}%6.2fs  $site")
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })

    val names: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq

    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val planDir = new java.io.File(s"plans/$tag")
    planDir.mkdirs()

    println("name,secs,jobs,stages,tasks,shuffle_read_mb,shuffle_write_mb")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm pass: classes + codegen caches, on the tiny sf
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
      jobs.set(0); stages.set(0); tasks.set(0)
      shuffleRead.set(0); shuffleWrite.set(0)
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"$name,ERR ${e.getClass.getSimpleName}: ${e.getMessage}")
        e.printStackTrace()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      // listener events are async; let the bus drain before reading
      Thread.sleep(300)
      println(f"$name,$secs%.2f,${jobs.get},${stages.get},${tasks.get}," +
        f"${shuffleRead.get / 1e6}%.1f,${shuffleWrite.get / 1e6}%.1f")
      if (wantPlans) {
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"plans/$tag/${name}_$suffix.txt"), plan)
        } catch { case _: Throwable => () }
      }
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
