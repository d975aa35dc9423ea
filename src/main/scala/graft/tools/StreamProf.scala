package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Throwaway per-trigger profiler for the stream gates (not part of the
  * library surface): attaches a StreamingQueryListener and dumps each
  * micro-batch's durationMs breakdown (addBatch, getBatch, walCommit,
  * queryPlanning, triggerExecution, commitOffsets) plus the wall-clock
  * per gate, to show where the fixed trigger cost lives. */
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
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").collect()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"SPROF start ${e.name} at ${System.nanoTime() / 1000000}ms")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        println(f"SPROF batch ${p.batchId}%2d rows=${p.numInputRows}%6d " +
          f"trigger=${d.getOrDefault("triggerExecution", -1L)}%5d " +
          f"addBatch=${d.getOrDefault("addBatch", -1L)}%5d " +
          f"getBatch=${d.getOrDefault("getBatch", -1L)}%4d " +
          f"latestOffset=${d.getOrDefault("latestOffset", -1L)}%4d " +
          f"plan=${d.getOrDefault("queryPlanning", -1L)}%4d " +
          f"wal=${d.getOrDefault("walCommit", -1L)}%4d " +
          f"commit=${d.getOrDefault("commitOffsets", -1L)}%4d")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val gates = if (args.nonEmpty) args.toSeq
      else Seq("stream_hourly_counts", "stream_sessionize", "stream_dedup",
               "stream_late_data", "stream_attribution")
    for (rep <- 1 to 2; g <- gates) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(g)(spark, dir).count()
      println(f"SPROF total rep$rep $g%-22s ${(System.nanoTime() - t0) / 1e9}%6.3f s  rows=$n")
    }
    spark.stop()
  }
}
