package graft.tools
import org.apache.spark.sql.SparkSession

/** Throwaway: is window_topk's unmoved sf1 cost the ObjectHashAggregate
  * sort-based fallback (default threshold: 128 distinct groups in the
  * in-memory map — there are ~100k customers)? */
object WtkProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val thresh = args.headOption.getOrElse("128")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thresh)
      .config(graft.operators.Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/sf1_local")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (n <- Seq("window_topk", "text_ngram_vocab")) {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        graft.operators.Checkpoints.releaseAll(spark)
        t
      }.sorted
      println(f"WTK thresh=$thresh $n median=${ts(2)}%6.3f min=${ts.head}%6.3f")
    }
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    def timeV(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"WTK thresh=$thresh $name median=${ts(2)}%6.3f min=${ts.head}%6.3f")
    }
    def orders = graft.operators.Tables.t(spark, dir, "orders")
    def finish(g: DataFrame) = g
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("o_custkey"), col("e.payload").as("o_orderkey"),
              (col("e.count").cast("double") / 100.0).as("o_totalprice"),
              (col("pos") + 1).cast("int").as("rn"))
    timeV("wtk_preproject") { finish(orders
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        lpad(col("o_orderkey").cast("string"), 12, "0").as("tag"),
        col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(graft.functions.TopKByCount.topKByCount(
        col("cents"), col("tag"), col("o_orderkey"), 3).as("top"))) }
    timeV("wtk_repart_single") { finish(orders
      .repartition(col("o_custkey"))
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        lpad(col("o_orderkey").cast("string"), 12, "0").as("tag"),
        col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(graft.functions.TopKByCount.topKByCount(
        col("cents"), col("tag"), col("o_orderkey"), 3).as("top"))) }
    timeV("wtk_scan_only") { orders
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        lpad(col("o_orderkey").cast("string"), 12, "0").as("tag"),
        col("o_orderkey")) }
    spark.stop()
  }
}
