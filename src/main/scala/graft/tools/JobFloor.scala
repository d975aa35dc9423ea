package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object JobFloor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Sessions.ramLocalDir("graft_jf_local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // find one staged-like parquet file: just use an events table file
    val dir = "/root/testdata/sf0.1"
    val ev = graft.operators.Tables.events(spark, dir)
    // stage one ~33k-row file on tmpfs
    val f = "/dev/shm/graft_jobfloor.parquet"
    ev.limit(33334).coalesce(1).write.mode("overwrite").parquet(f)
    val schema = graft.streaming.EventStreams.eventsRawSchema
    for (rep <- 1 to 10) {
      val t0 = System.nanoTime()
      spark.read.schema(schema).parquet(f)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)), sum(col("value").cast("decimal(18,2)")).cast("double"))
        .write.format("noop").mode("overwrite").save()
      println(f"JOBFLOOR agg1file rep$rep ${(System.nanoTime()-t0)/1e6}%8.1f ms")
    }
    for (rep <- 1 to 10) {
      val t0 = System.nanoTime()
      spark.range(100).selectExpr("sum(id)").collect()
      println(f"JOBFLOOR rangesum rep$rep ${(System.nanoTime()-t0)/1e6}%8.1f ms")
    }
    spark.stop()
  }
}
