package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway component timing for events_kanon's fine aggregate at sf1.
  * All probes force full results through a noop sink — a bare count()
  * lets Catalyst PRUNE the countDistinct out of the child aggregate and
  * times a different (much cheaper) query. */
object KanonProbe {
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
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROBE $name%-28s median=${ts(2)}%6.3f min=${ts.head}%6.3f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def ev = graft.operators.Tables.events(spark, dir)
    def base = ev.select(col("event_type"),
      date_format(col("ts"), "yyyy-MM-dd HH:00").as("win"), col("user_id"))
    time("base_noop") { noop(base) }
    time("grp_count_only") { noop(base.groupBy("event_type", "win")
      .agg(count(lit(1)).as("n_events"))) }
    time("fine_with_distinct") { noop(base.groupBy("event_type", "win")
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_users"))) }
    time("pre_agg_rewrite") {
      val pre = base.groupBy("event_type", "win", "user_id")
        .agg(count(lit(1)).as("c"))
      noop(pre.groupBy("event_type", "win")
        .agg(sum(col("c")).as("n_events"), count(lit(1)).as("n_users")))
    }
    time("distinct_only") { noop(base.groupBy("event_type", "win")
      .agg(countDistinct(col("user_id")).as("n_users"))) }
    // hour bucket as a long through the heavy phases; format at cells level
    def baseL = ev.select(col("event_type"),
      (unix_timestamp(col("ts")).cast("long") / 3600L).as("h"), col("user_id"))
    time("fineL_with_distinct") { noop(baseL.groupBy("event_type", "h")
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_users"))
      .withColumn("win", date_format(
        timestamp_seconds(col("h") * 3600L), "yyyy-MM-dd HH:00"))) }
    time("preL_agg_rewrite") {
      val pre = baseL.groupBy("event_type", "h", "user_id")
        .agg(count(lit(1)).as("c"))
      noop(pre.groupBy("event_type", "h")
        .agg(sum(col("c")).as("n_events"), count(lit(1)).as("n_users"))
        .withColumn("win", date_format(
          timestamp_seconds(col("h") * 3600L), "yyyy-MM-dd HH:00")))
    }
    // un-pin the single-row-group scan: ONE exchange on (etype, h) that
    // satisfies BOTH stacked aggregates' distributions (the q20 pattern)
    time("preR_repart_first") {
      val pre = baseL.repartition(col("event_type"), col("h"))
        .groupBy("event_type", "h", "user_id")
        .agg(count(lit(1)).as("c"))
      noop(pre.groupBy("event_type", "h")
        .agg(sum(col("c")).as("n_events"), count(lit(1)).as("n_users"))
        .withColumn("win", date_format(
          timestamp_seconds(col("h") * 3600L), "yyyy-MM-dd HH:00")))
    }
    time("fineR_repart_first") {
      noop(baseL.repartition(col("event_type"), col("h"))
        .groupBy("event_type", "h")
        .agg(count(lit(1)).as("n_events"),
             countDistinct(col("user_id")).as("n_users"))
        .withColumn("win", date_format(
          timestamp_seconds(col("h") * 3600L), "yyyy-MM-dd HH:00")))
    }
    spark.stop()
  }
}
