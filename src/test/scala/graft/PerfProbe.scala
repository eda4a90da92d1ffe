package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query execution breakdown: wall time vs jobs / stages / tasks /
  * summed task time / executor CPU time / shuffle bytes. Tells whether
  * a bench-scale query is compute-bound (taskTime ≈ cpuTime ≈ wall ×
  * cores) or overhead-bound (wall ≫ taskTime / cores: job barriers,
  * planning, codegen, scheduling). Test-scope diagnostic only.
  *
  *   sbt "Test/runMain graft.PerfProbe q381_epps,q153_hurst"
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = args.headOption.map(_.split(',').toSet)
      .getOrElse(sys.error("pass a comma-separated query list"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val cpuNs = new AtomicLong
    val shufR = new AtomicLong
    val shufW = new AtomicLong
    val stageAgg =
      new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val info = s.stageInfo
        val key = info.name.take(120)
        val cpu = info.taskMetrics.executorCpuTime
        val run = info.taskMetrics.executorRunTime
        stageAgg.merge(key, (run, cpu, info.numTasks), {
          case ((r1, c1, n1), (r2, c2, n2)) => (r1 + r2, c1 + c2, n1 + n2)
        })
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        taskMs.addAndGet(t.taskInfo.duration)
        if (t.taskMetrics != null) {
          cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
          shufR.addAndGet(t.taskMetrics.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    // optional 2nd arg: in-JVM interleaved A/B over a session-conf
    // key, "key=valA|valB" — each pass alternates the two values so
    // both variants share the session's drift (the PERF.md protocol)
    val ab: Option[(String, String, String)] = args.drop(1).headOption.map { s =>
      val Array(k, vs) = s.split("=", 2)
      val Array(a, b) = vs.split("\\|", 2)
      (k, a, b)
    }
    val picked = SparkEntry.queries.filter { case (n, _) => only(n) }
    picked.foreach { case (name, fn) =>
      // warm-up (JIT + footer caches), as Bench does — once per variant
      ab.foreach { case (k, a, _) => spark.conf.set(k, a) }
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      ab.foreach { case (k, _, b) => spark.conf.set(k, b) }
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      val passes = if (ab.isDefined) 10 else 2
      (1 to passes).foreach { pass =>
        val variant = ab.map { case (k, a, b) =>
          val v = if (pass % 2 == 1) a else b
          spark.conf.set(k, v); v
        }.getOrElse("-")
        Thread.sleep(200) // drain listener bus
        jobs.set(0); stages.set(0); tasks.set(0)
        taskMs.set(0); cpuNs.set(0); shufR.set(0); shufW.set(0)
        stageAgg.clear()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(200) // let straggler events land
          println(f"[probe] $name%-28s pass=$pass%2d v=$variant%-12s wall=$wall%6.2fs " +
            f"jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d " +
            f"taskSum=${taskMs.get / 1e3}%7.2fs cpuSum=${cpuNs.get / 1e9}%7.2fs " +
            f"shufR=${shufR.get / 1048576.0}%7.1fMB shufW=${shufW.get / 1048576.0}%7.1fMB")
          if (sys.env.contains("PROBE_STAGES") && pass == passes) {
            import scala.jdk.CollectionConverters._
            stageAgg.asScala.toSeq.sortBy(-_._2._1).take(8).foreach {
              case (k, (run, cpu, n)) =>
                println(f"[stage] run=${run / 1e3}%7.2fs cpu=${cpu / 1e9}%7.2fs " +
                  f"tasks=$n%4d  $k")
            }
          }
        } catch {
          case e: Throwable =>
            println(s"[probe] $name pass=$pass THREW ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
