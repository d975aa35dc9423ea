package graft

import java.io.File
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * E10's last facet — speculative re-launch of a straggler, the Spark twin
 * of the reference coordinator's 5 s timeout-requeue
 * (`/root/reference/distributed/src/bin/coordinator.rs:112-131`): a task
 * that is merely SLOW (not failed) is re-issued to another worker, and
 * the job completes from whichever attempt finishes first, with
 * exactly-once visible output.
 *
 * Deployment shape matters twice over here:
 *
 *  - Spark disables speculation under a `local[n]` master
 *    (`TaskSchedulerImpl.start` guards the timer with `!isLocal`), and a
 *    `local-cluster[...]` is not enough either — the speculative copy
 *    may never be placed on the HOST of the original attempt
 *    (`TaskSetManager.dequeueSpeculativeTask`), and every local-cluster
 *    worker shares one hostname.
 *  - So this spec stands up the real thing: a standalone Master and two
 *    Worker processes as SEPARATE JVMs on distinct loopback addresses
 *    (127.0.0.1 / 127.0.0.2) — the same coordinator + worker-processes
 *    topology the reference's Makefile runs (`Makefile:9-26`), which
 *    also exercises multi-process deployment end-to-end.
 *
 * Needs its own JVM (one SparkContext per JVM; every other suite shares
 * TestSpark's) — see `Test / testGrouping` in build.sbt.
 */
class SpeculationSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED")

  private def freePort(): Int = {
    val ss = new java.net.ServerSocket(0)
    try ss.getLocalPort finally ss.close()
  }

  private def awaitPort(host: String, port: Int, timeoutMs: Long): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var up = false
    while (!up) {
      try { new java.net.Socket(host, port).close(); up = true }
      catch { case _: java.io.IOException =>
        if (System.nanoTime() > deadline)
          fail(s"$host:$port did not come up within $timeoutMs ms")
        Thread.sleep(200)
      }
    }
  }

  /** Launch a Spark deploy daemon (Master/Worker) as its own OS process. */
  private def launch(cls: String, args: Seq[String], logTag: String): Process = {
    val java = s"${sys.props("java.home")}/bin/java"
    val cmd = Seq(java) ++ addOpens ++
      Seq("-Xmx512m", "-cp", sys.props("java.class.path"), cls) ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    pb.redirectOutput(Files.createTempFile(s"graft_spec_$logTag", ".log").toFile)
    pb.start()
  }

  test("a straggler is speculatively re-launched on another worker; the job completes from the copy (E10)") {
    val port = freePort()
    val masterUrl = s"spark://127.0.0.1:$port"
    val master = launch("org.apache.spark.deploy.master.Master",
      Seq("--host", "127.0.0.1", "--port", port.toString, "--webui-port", "0"),
      "master")
    var workers: Seq[Process] = Nil
    var spark: SparkSession = null
    try {
      awaitPort("127.0.0.1", port, 30000)
      // two one-core workers on DISTINCT loopback hosts, so the
      // speculative copy has a legal placement away from the straggler
      workers = Seq("127.0.0.1", "127.0.0.2").map { h =>
        launch("org.apache.spark.deploy.worker.Worker",
          Seq("--host", h, "--cores", "1", "--memory", "1g",
            "--webui-port", "0",
            "--work-dir", Files.createTempDirectory("graft_spec_work").toString,
            masterUrl),
          s"worker-${h.replace('.', '_')}")
      }
      spark = SparkSession.builder()
        .master(masterUrl)
        .appName("graft-speculation")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.extraJavaOptions", addOpens.mkString(" "))
        .config("spark.executor.memory", "512m")
        .config("spark.speculation", "true")
        // the reference uses a fixed 5 s straggler timeout; Spark's
        // policy is relative — multiplier x median of finished tasks,
        // checked every interval once `quantile` of the stage is done
        .config("spark.speculation.interval", "100ms")
        .config("spark.speculation.multiplier", "1.5")
        .config("spark.speculation.quantile", "0.5")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      // both executors registered before the job, so placement is
      // deterministic enough to reason about
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (spark.sparkContext.getExecutorMemoryStatus.size < 3) {
        if (System.nanoTime() > deadline) fail("executors did not register")
        Thread.sleep(200)
      }

      val s = spark
      import s.implicits._
      val speculativeOk = new AtomicInteger
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
          if (te.taskInfo.speculative && te.taskInfo.successful)
            speculativeOk.incrementAndGet()
      })
      val stragglerSleepMs = 60000L
      val t0 = System.nanoTime()
      val out = spark.range(0, 400, 1, 4).as[Long].mapPartitions { it =>
        val tc = TaskContext.get()
        // the ORIGINAL attempt of partition 0 stalls far past the job's
        // natural runtime; the speculative copy (attemptNumber > 0)
        // runs clean. The stalled original is killed once the copy
        // commits — swallow the interrupt so the kill is quiet.
        if (tc.partitionId() == 0 && tc.attemptNumber() == 0)
          try Thread.sleep(stragglerSleepMs)
          catch { case _: InterruptedException => () } // killed: discarded
        it
      }.collect().sorted.toSeq
      val elapsedMs = (System.nanoTime() - t0) / 1e6

      // completed from the speculative attempt, not by waiting out the
      // straggler: well under the injected stall
      assert(elapsedMs < stragglerSleepMs / 2,
        s"job took $elapsedMs ms — speculation did not rescue the straggler")
      // exactly-once visible output despite two attempts of partition 0
      assert(out == (0L until 400L),
        "result must equal the input multiset exactly once")
      // the rescue really was a speculative attempt (listener-observed)
      assert(speculativeOk.get() >= 1,
        "no successful speculative task observed")
    } finally {
      if (spark != null) spark.stop()
      workers.foreach(_.destroyForcibly())
      master.destroyForcibly()
    }
  }
}
