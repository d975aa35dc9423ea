package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway: time the gated streaming queries and dump per-batch
  * progress durations (not part of the library surface). */
object ScratchStream {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val progress = new scala.collection.mutable.ArrayBuffer[String]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        progress += s"batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}"
      }
    })

    for (q <- (if (args.nonEmpty) args.toSeq else Seq("stream_dedup"))) {
      for (rep <- 1 to 3) {
        progress.clear()
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$q rep$rep: $dt%.2f s rows=$n")
        progress.foreach(l => println(s"  $l"))
      }
    }
    spark.stop()
  }
}
