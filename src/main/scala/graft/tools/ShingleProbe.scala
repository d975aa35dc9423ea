package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway (VERDICT r16 item 1): leg-by-leg costs of the shingle-pair
  * dataflow shared by dedup_containment / dedup_ngram_jaccard, plus an
  * A/B of the intersection leg: hash self-join on h vs per-h
  * collect_list + native CombinationPairs explode (the market-basket /
  * common-neighbors idiom). Legs are measured CUMULATIVE (each includes
  * its upstream, no lineage cuts) — read deltas between lines. */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Sessions.ramLocalDir("graft_shprobe"))
      .config(graft.operators.Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/sf1_local")
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROBE $name%-28s median=${ts(1)}%6.3f min=${ts.head}%6.3f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def toks(c: org.apache.spark.sql.Column) =
      graft.functions.TextFunctions.wsTokens(c)
    def shingles3(ts: org.apache.spark.sql.Column) =
      graft.functions.TextFunctions.ngramsJoined(ts, 3)
    import graft.operators.Tables.{t, md5Long}
    def shAll = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), toks(col("text")).as("ts"))
      .select(col("doc_id"), explode(shingles3(col("ts"))).as("shingle"),
              col("lang"))
      .select(col("doc_id"),
              md5Long(concat_ws("", col("lang"), col("shingle"))).as("h"))
    def hot = shAll.groupBy(col("h"))
      .agg(count(lit(1)).as("df")).filter(col("df") > 128).select(col("h"))
    def sh = shAll.join(hot, Seq("h"), "left_anti")
    def counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    def inter = sh.as("a")
      .join(sh.as("b"),
            col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    // A/B: per-h posting lists (df-capped, so ≤128 entries) exploded to
    // pairs by the native codegen CombinationPairs — one exchange of the
    // shingle rows instead of a 5M-row hash-join build + probe
    def interB = sh.groupBy(col("h"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(
        graft.functions.CombinationPairs.combinationPairs(col("ds"))).as("p"))
      .filter(col("p.a") =!= col("p.b")) // a doc repeating a shingle
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    def pairs(i: org.apache.spark.sql.DataFrame) = i
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")

    spark.range(1000).selectExpr("sum(id)").collect()
    time("1_shAll_explode_md5") { noop(shAll) }
    time("2_hot_agg") { noop(hot) }
    time("3_sh_antijoin") { noop(sh) }
    time("4_counts") { noop(counts) }
    time("5_inter_selfjoin") { noop(inter) }
    time("5b_inter_combpairs") { noop(interB) }
    time("6_pairs_full") { noop(pairs(inter)) }
    time("6b_pairs_full_B") { noop(pairs(interB)) }
    // equivalence check (multiplicity semantics must match the join)
    val diff = inter.as("x").join(interB.as("y"),
        col("x.doc_a") === col("y.doc_a") && col("x.doc_b") === col("y.doc_b"),
        "full_outer")
      .filter(col("x.n_inter").isNull || col("y.n_inter").isNull ||
              col("x.n_inter") =!= col("y.n_inter")).count()
    println(s"PROBE equivalence: inter vs interB differing rows = $diff")
    time("7_query_containment") {
      graft.SparkEntry.queries("dedup_containment")(spark, dir).count()
      graft.operators.Checkpoints.releaseAll(spark)
    }
    time("7_query_jaccard") {
      graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, dir).count()
      graft.operators.Checkpoints.releaseAll(spark)
    }
    spark.stop()
  }
}
