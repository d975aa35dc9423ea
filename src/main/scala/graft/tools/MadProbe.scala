package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway A/B probe for the events_mad_outliers shape question
  * (VERDICT r14 item 2): does the UNCUT dev subtree re-execute at sf1,
  * or does exchange reuse dedupe it? Prints the EXECUTED (post-AQE)
  * plan's scan/exchange/reuse counts for the uncut variant. */
object MadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.operators.Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/sf1_local")
    val c = graft.operators.Tables.t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
              (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val med = c.groupBy(col("user_id"))
      .agg(percentile(col("cents"), lit(0.5)).as("med"))
    val dev = c.join(med, "user_id")
      .withColumn("adev", abs(col("cents").cast("double") - col("med")))
    val mad = dev.groupBy(col("user_id"))
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    val out = dev.join(mad, "user_id")
      .filter(col("adev") > lit(3.0) * col("mad"))
      .select(col("user_id"), col("event_id"), col("cents"),
              col("med"), col("mad"))
    out.count()
    val p = out.queryExecution.executedPlan.toString
    def n(pat: String) = pat.r.findAllIn(p).size
    println(s"SCANS=${n("Scan parquet")} EXCH=${n("Exchange")} REUSED_EXCH=${n("ReusedExchange")} REUSED_SUB=${n("ReusedSubquery")} BHJ=${n("BroadcastHashJoin")} SMJ=${n("SortMergeJoin")}")
    spark.stop()
  }
}
