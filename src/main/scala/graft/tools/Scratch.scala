package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway exploration main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.select(col("event_id"), col("ts"),
        timestamp_micros(expr("ts div 1000")).as("ts_us"),
        date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s"))
      .show(5, false)
    spark.stop()
  }
}
