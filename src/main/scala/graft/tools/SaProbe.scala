package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: stage costs of dedup_suffix_array at sf1. */
object SaProbe {
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
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROBE $name%-24s median=${ts(1)}%6.3f min=${ts.head}%6.3f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def toks(c: org.apache.spark.sql.Column) =
      graft.functions.TextFunctions.wsTokens(c)
    def d = graft.operators.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), toks(col("text")).as("ts"))
      .withColumn("n_toks", size(col("ts")).cast("long"))
    def bigram = d.select(col("doc_id"), col("n_toks"),
        posexplode(expr(
          """transform(ts, (tk, i) -> struct(
            |  tk AS ra,
            |  IF(i + 2 <= size(ts), concat('', element_at(ts, i + 2)), '') AS rb))"""
            .stripMargin)).as(Seq("off", "pr")))
      .select(col("doc_id"), col("n_toks"), col("off"),
              col("pr.ra"), col("pr.rb"))
    time("bigram_explode") { noop(bigram) }
    time("classes_distinct") { noop(bigram.select(col("ra"), col("rb")).distinct()) }
    time("classes_sorted") { noop(bigram.select(col("ra"), col("rb")).distinct()
      .repartitionByRange(col("ra"), col("rb"))
      .sortWithinPartitions(col("ra"), col("rb"))) }
    time("rank_join") { noop(graft.operators.Dedup.classRank(bigram, "r")) }
    spark.stop()
  }
}
