package graft.tools
import org.apache.spark.sql.SparkSession

/** Median-of-N timing for named queries (Bench runs each once, so a single
  * noisy run can mislead tuning). Usage: Timeit <reps> <query>... */
object Timeit {
  def main(args: Array[String]): Unit = {
    val reps = args.head.toInt
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.operators.Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM warm-up
    for (n <- args.tail) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // noop sink, NOT count(): count() lets Catalyst prune terminal
        // projections, so pure-map queries (redaction, quantization, …)
        // would time only their scan — the noop write forces every row
        // and column to be produced.
        graft.SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.size / 2)
      println(f"TIMEIT $n%-24s median=$med%7.3f  min=${times.head}%7.3f  max=${times.last}%7.3f")
    }
    spark.stop()
  }
}
