package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-trigger duration breakdown for the gated stream queries: attaches
  * a StreamingQueryListener and dumps each progress event's durationMs
  * map while the named queries run. Usage: StreamProf <query>... */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Sessions.ramLocalDir("graft_sprof_local"))
      .config(graft.operators.Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"STREAM start ${e.name} at ${System.nanoTime() / 1000000}ms")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"STREAM ${p.name} batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${new java.util.TreeMap[String, java.lang.Long](p.durationMs)}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"STREAM end at ${System.nanoTime() / 1000000}ms")
    })
    for (n <- args) {
      println(s"===== $n =====")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).count()
      println(f"TOTAL $n ${(System.nanoTime() - t0) / 1e9}%.2f s (first run incl. staging)")
      val t1 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).count()
      println(f"TOTAL $n ${(System.nanoTime() - t1) / 1e9}%.2f s (staged)")
    }
    spark.stop()
  }
}
