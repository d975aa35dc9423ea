package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway A/B: raw-token explode vs in-row ItemCounts for the native
  * wordcount / inverted-index twins at sf1. */
object WcProbe {
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
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROBE $name%-24s median=${ts(3)}%6.3f min=${ts.head}%6.3f")
    }
    def d = graft.operators.Tables.t(spark, dir, "documents")
    time("wc_raw_explode") { d
      .select(explode(split(col("text"), "[^a-zA-Z]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt")).count() }
    time("wc_itemcounts") { d
      .select(explode(graft.functions.TextFunctions.itemCounts(
        split(col("text"), "[^a-zA-Z]+"))).as("e"))
      .filter(length(col("e.item")) > 0)
      .groupBy(col("e.item").as("word"))
      .agg(sum(col("e.n")).as("cnt")).count() }
    time("ii_raw_distinct") { d
      .select(col("doc_id").cast("string").as("dd"),
              explode(split(col("text"), "[^a-zA-Z]+")).as("word"))
      .filter(length(col("word")) > 0).distinct()
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_docs"),
           concat_ws(",", sort_array(collect_list(col("dd")))).as("docs"))
      .count() }
    time("ii_itemcounts") { d
      .select(col("doc_id").cast("string").as("dd"),
              explode(graft.functions.TextFunctions.itemCounts(
                split(col("text"), "[^a-zA-Z]+"))).as("e"))
      .select(col("dd"), col("e.item").as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_docs"),
           concat_ws(",", sort_array(collect_list(col("dd")))).as("docs"))
      .count() }
    spark.stop()
  }
}
