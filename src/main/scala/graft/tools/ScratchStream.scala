package graft.tools

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway: inspect micro-batch/watermark behavior of the late-data
  * staging (not part of the library surface). */
object ScratchStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    val tmp = Files.createTempDirectory("graft_scratch_late").toFile
    val raw = graft.operators.Tables.events(spark, dir)
    val chunks = 4
    val ranked = raw.withColumn("mb",
      ntile(chunks).over(Window.orderBy(col("ts"), col("event_id"))))
      .withColumn("mb",
        when(col("mb") < chunks && col("event_id") % 101 === 0,
             lit(chunks)).otherwise(col("mb")))
      .localCheckpoint(true)
    for (i <- 1 to chunks) {
      val stage = new File(tmp, s"_stage$i")
      ranked.filter(col("mb") === i).drop("mb")
        .coalesce(1).write.parquet(stage.toString)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new File(tmp, f"batch$i%02d.parquet")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * i)
      def rm(f: File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(stage)
    }

    val ckpt = Files.createTempDirectory("graft_scratch_ckpt").toFile
    val q = graft.streaming.EventStreams.hourlyCountsAppend(
        graft.streaming.EventStreams.readEventsStream(spark, tmp.toString))
      .writeStream.format("memory").queryName("late_dbg")
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .start()
    q.processAllAvailable()
    q.recentProgress.foreach { p =>
      println(s"batch=${p.batchId} rows=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")} " +
        s"dropped=${p.stateOperators.map(_.numRowsDroppedByWatermark).mkString(",")}")
    }
    q.stop()
    println("sink rows: " + spark.table("late_dbg").count())
    spark.stop()
  }
}
