package graft
import org.apache.spark.sql.SparkSession
/** plans/r14 dump: explain("formatted") per named query to files. */
object ExplainFmt {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val names = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        val txt = df.queryExecution.explainString(plan)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
        println(s"[explain] wrote $n")
      } catch { case e: Throwable => println(s"[explain] $n failed: $e") }
    }
    spark.stop()
  }
}
