package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional arg: comma-separated query-name filter (iteration aid;
    // the driver passes no args and benches everything)
    val only: Option[Set[String]] = args.headOption.map(_.split(',').toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up pass: JIT-compile the codegen'd stages and prime
    // the parquet footer caches, then measure. Run-to-run variance on a
    // cold JVM was 2-4x on the heavier queries.
    val picked = SparkEntry.queries.filter { case (n, _) => only.forall(_(n)) }
    picked.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // Three timed passes. Per query we report:
    //   - min    — engine cost net of host noise (this host shows
    //     intermittent external contention inflating arbitrary queries
    //     10-30x);
    //   - median — robust to one contended pass but still sensitive to
    //     real regressions that min alone can mask.
    // A query that THROWS is reported in "failures" with -1 timings —
    // never as a (fast-looking) elapsed time of the exception path.
    def timedPass(): Map[String, (Double, Boolean)] =
      picked.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        name -> ((System.nanoTime() - t0) / 1e9, ok)
      }
    val passes = Seq(timedPass(), timedPass(), timedPass())
    val names = picked.keys.toSeq
    val failures = names.filter(n => passes.exists(!_(n)._2))
    def minOf(n: String): Double = passes.map(_(n)._1).min
    def medianOf(n: String): Double = passes.map(_(n)._1).sorted.apply(1)
    def fmt(f: String => Double): String =
      names.map(n => s"\"" + n + "\":" + (if (failures.contains(n)) -1.0 else f(n)))
        .mkString("{", ",", "}")
    val total = names.filterNot(failures.contains).map(minOf).sum
    val totalMedian = names.filterNot(failures.contains).map(medianOf).sum
    val failList = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":${fmt(minOf)},"queries_median":${fmt(medianOf)},""" +
      s""""failures":$failList,"sf":"$sfDir"}"""
    println(fullJson)
    // The driver captures only the TAIL of stdout, so the full per-query
    // line can overflow its buffer (round 6 shipped "parsed": null).
    // Persist it to a file too so the artifact survives without a re-run.
    // The SF dir is part of the name so sweeps over several factors (or
    // concurrent runs) don't clobber each other; a write failure prints
    // one warning instead of vanishing.
    val sfTag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_").stripPrefix("_")
    // Two copies: /tmp for ad-hoc diffing, and bench/ inside the repo so
    // the full per-query history is COMMITTED per round (the driver's
    // BENCH_r0N.json keeps only a 2000-char stdout tail — round-over-round
    // per-query regression reads need the durable file).
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/tmp/bench_out_$sfTag.json"), fullJson)
      val benchDir = java.nio.file.Paths.get("bench")
      java.nio.file.Files.createDirectories(benchDir)
      java.nio.file.Files.writeString(
        benchDir.resolve(s"bench_$sfTag.json"), fullJson)
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] WARN could not persist artifact: $e")
    }
    // Trailing compact summary: the driver captures the TAIL of stdout, so
    // when the full per-query line above gets truncated the totals must
    // survive on their own. Keep this line last and short.
    println(s"""{"total_min":$total,"total_median":$totalMedian,""" +
      s""""n":${names.size},"failures":$failList,"sf":"$sfDir"}""")
    spark.stop()
  }
}
