package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Throwaway experiment harness for the stream-gate fixed-cost hunt (r12):
  * runs the five gates under named conf combos (state-store provider,
  * format validation, …) and prints per-gate warm totals plus the
  * state-operator commit breakdown from StreamingQueryProgress. */
object StreamLab {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Sessions.ramLocalDir("graft_slab_local"))
      .config(graft.operators.Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").collect()

    @volatile var commitMs = 0L
    @volatile var addBatchMs = 0L
    @volatile var taskRunMs = 0L
    @volatile var stageWallMs = 0L
    @volatile var nStages = 0
    @volatile var nTasks = 0
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        nStages += 1
        nTasks += si.numTasks
        taskRunMs += si.taskMetrics.executorRunTime
        for (s <- si.submissionTime; c <- si.completionTime) stageWallMs += (c - s)
        if (sys.env.contains("SLAB_STAGES"))
          println(f"SLAB   stage ${si.stageId}%3d tasks=${si.numTasks}%3d " +
            f"run=${si.taskMetrics.executorRunTime}%5d ms " +
            f"deser=${si.taskMetrics.executorDeserializeTime}%4d ms " +
            f"wall=${(for (s <- si.submissionTime; c <- si.completionTime) yield c - s).getOrElse(-1L)}%5d ms  ${si.name.take(90)}")
      }
    })
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        addBatchMs += p.durationMs.getOrDefault("addBatch", 0L)
        p.stateOperators.foreach(s => commitMs += s.commitTimeMs)
      }
    })

    val gates = Seq("stream_hourly_counts", "stream_sessionize", "stream_dedup",
                    "stream_late_data", "stream_attribution")

    val combos: Seq[(String, Map[String, String])] = Seq(
      "baseline" -> Map(),
      "rocksdb" -> Map(
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"),
      "noval" -> Map(
        "spark.sql.streaming.stateStore.formatValidation.enabled" -> "false"),
      "novalcl" -> Map(
        "spark.sql.streaming.stateStore.formatValidation.enabled" -> "false",
        "spark.sql.streaming.stateStore.compression.codec" -> "lz4"),
      "retain1" -> Map(
        "spark.sql.streaming.maxBatchesToRetainInMemory" -> "1"),
      "snapmaint" -> Map(
        "spark.sql.streaming.stateStore.minDeltasForSnapshot" -> "100",
        "spark.sql.streaming.stateStore.maintenanceInterval" -> "600s"),
      "all3" -> Map(
        "spark.sql.streaming.maxBatchesToRetainInMemory" -> "1",
        "spark.sql.streaming.stateStore.minDeltasForSnapshot" -> "100",
        "spark.sql.streaming.stateStore.maintenanceInterval" -> "600s"),
      "baseline2" -> Map()
    )
    val picked = if (args.nonEmpty) combos.filter(c => args.contains(c._1)) else combos

    for ((name, confs) <- picked) {
      val prev = confs.keys.map(k => k -> util.Try(spark.conf.get(k)).toOption).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // warmup pass (staging + codegen), then 2 measured passes
      for (g <- gates) graft.SparkEntry.queries(g)(spark, dir).count()
      for (rep <- 1 to 2) {
        var famTot = 0.0
        for (g <- gates) {
          commitMs = 0L; addBatchMs = 0L
          taskRunMs = 0L; stageWallMs = 0L; nStages = 0; nTasks = 0
          val t0 = System.nanoTime()
          val n = graft.SparkEntry.queries(g)(spark, dir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          famTot += dt
          println(f"SLAB $name%-10s rep$rep $g%-22s $dt%6.3f s  addBatch=${addBatchMs}%5d ms commit=${commitMs}%5d ms stages=$nStages%2d tasks=$nTasks%3d taskRun=${taskRunMs}%5d ms stageWall=${stageWallMs}%5d ms rows=$n")
        }
        println(f"SLAB $name%-10s rep$rep FAMILY $famTot%6.3f s")
      }
      prev.foreach { case (k, vOpt) => vOpt match {
        case Some(v) => spark.conf.set(k, v); case None => spark.conf.unset(k) } }
    }
    spark.stop()
  }

  private object util { def Try[A](a: => A): scala.util.Try[A] = scala.util.Try(a) }
}
