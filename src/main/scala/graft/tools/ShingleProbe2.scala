package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway (r17): interleaved A/B/C/D of the FULL shingle-pair
  * dataflow (pairs with na/nb, the shared machinery of
  * dedup_containment / dedup_ngram_jaccard), isolating which component
  * of the single-aggregate rewrite is slow. Variants:
  *   join     — r16 committed: cut shAll, hot agg, anti-join, cut sh,
  *              hash self-join pairs, counts joins
  *   posting2 — like join but pairs via collect_list + CombinationPairs
  *   agg1cl   — ONE aggregate (count + collect_list), counts from lists
  *   agg1     — ONE aggregate (count + CollectLongsCapped), counts from lists
  * Each rep runs count() then releases cuts, like Bench. */
object ShingleProbe2 {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Sessions.ramLocalDir("graft_shp2"))
      .config(graft.operators.Tables.NanosConf, "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
              graft.Sessions.ObjectAggFallbackGroups)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/sf1_local")
    import graft.operators.{Checkpoints, Tables}
    import Tables.{t, md5Long}
    def toks(c: org.apache.spark.sql.Column) =
      graft.functions.TextFunctions.wsTokens(c)
    def shingles3(ts: org.apache.spark.sql.Column) =
      graft.functions.TextFunctions.ngramsJoined(ts, 3)
    val cap = 128

    def shAllRaw = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), toks(col("text")).as("ts"))
      .select(col("doc_id"), explode(shingles3(col("ts"))).as("shingle"), col("lang"))
      .select(col("doc_id"),
              md5Long(concat_ws("", col("lang"), col("shingle"))).as("h"))

    def joinCounts(inter: DataFrame, counts: DataFrame) = inter
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")

    def twoCut(pairsOf: DataFrame => DataFrame): DataFrame = {
      val shAll = Checkpoints.cut(shAllRaw, eager = false)
      val hot = shAll.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select(col("h"))
      val sh = Checkpoints.cut(shAll.join(hot, Seq("h"), "left_anti"), eager = false)
      val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      joinCounts(pairsOf(sh), counts)
    }

    def vJoin = twoCut { sh =>
      sh.as("a")
        .join(sh.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_inter"))
    }

    def pairsFromLists(byH: DataFrame) = byH.filter(size(col("ds")) >= 2)
      .select(explode(
        graft.functions.CombinationPairs.combinationPairs(col("ds"))).as("p"))
      .filter(col("p.a") =!= col("p.b"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))

    def vPosting2 = twoCut { sh =>
      pairsFromLists(sh.groupBy(col("h"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ds")))
    }

    def agg1(listAgg: org.apache.spark.sql.Column): DataFrame = {
      val byH = Checkpoints.cut(
        shAllRaw.groupBy(col("h"))
          .agg(count(lit(1)).as("df"), listAgg.as("ds0"))
          .filter(col("df") <= cap)
          .select(sort_array(col("ds0")).as("ds")),
        eager = false)
      val counts = byH.select(explode(col("ds")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      joinCounts(pairsFromLists(byH), counts)
    }

    def vAgg1cl = agg1(collect_list(col("doc_id")))
    def vAgg1 = agg1(graft.functions.CollectLongsCapped
      .collectLongsCapped(col("doc_id"), cap + 1))
    // size-only form: no count(*) companion — truncation at cap+1 makes
    // size(ds0) <= cap an EXACT df filter
    def vAgg1b = {
      val byH = Checkpoints.cut(
        shAllRaw.groupBy(col("h"))
          .agg(graft.functions.CollectLongsCapped
            .collectLongsCapped(col("doc_id"), cap + 1).as("ds0"))
          .filter(size(col("ds0")) <= cap)
          .select(sort_array(col("ds0")).as("ds")),
        eager = false)
      val counts = byH.select(explode(col("ds")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      joinCounts(pairsFromLists(byH), counts)
    }

    val variants = Seq(
      "join" -> (() => vJoin), "posting2" -> (() => vPosting2),
      "agg1cl" -> (() => vAgg1cl), "agg1" -> (() => vAgg1),
      "agg1b" -> (() => vAgg1b))

    spark.range(1000).selectExpr("sum(id)").collect()
    // warm every variant once
    for ((_, f) <- variants) { f().count(); Checkpoints.releaseAll(spark) }
    val acc = collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector())
    for (r <- 1 to reps; (n, f) <- variants) {
      val t0 = System.nanoTime()
      f().count()
      val t = (System.nanoTime() - t0) / 1e9
      Checkpoints.releaseAll(spark)
      acc(n) = acc(n) :+ t
      println(f"SHP2 rep$r $n%-9s $t%6.2f")
    }
    for ((n, _) <- variants) {
      val xs = acc(n).sorted
      println(f"SHP2 MEDIAN $n%-9s ${xs(xs.size / 2)}%6.2f  min=${xs.head}%6.2f max=${xs.last}%6.2f")
    }
    spark.stop()
  }
}
