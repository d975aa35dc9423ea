package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway (r18, VERDICT r17 item 4): interleaved A/B of the
  * orders_market_basket pair-counting stage. OpProf r17 showed the cost
  * is ONE exchange of 1.2M near-unique (part,part) pairs where partial
  * aggregation reduces 0.08% — pure overhead. OSS Spark has no
  * skip-partial-agg switch, so the candidate restructure pre-filters
  * with an 8-byte pair hash (guide §3.2 applied to a self-aggregate):
  *   pass 1: aggregate xxhash64(a,b) counts (8B rows cross the exchange
  *           instead of the pair struct), keep hashes with count >= 2;
  *   pass 2: re-explode, broadcast-semi-join on the surviving hashes
  *           (drops ~99.8% of rows BEFORE the exchange), exact-aggregate
  *           the survivors. No false negatives (hash collisions only ADD
  *           survivors; the exact pass-2 aggregate + support filter
  *           keeps the result identical).
  * Variants: base (committed form) | hashpre (the restructure).
  * Usage: MbProbe [reps] — env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS. */
object MbProbe {
  private val MaxBasketParts = 64
  private val MinPairSupport = 2
  private val BasketTopK = 100

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(7)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Sessions.ramLocalDir("graft_mbp"))
      .config(graft.operators.Tables.NanosConf, "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.operators.{Checkpoints, Tables}

    def baskets = Checkpoints.cut(
      Tables.t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
        .filter(size(col("parts")) <= MaxBasketParts),
      eager = false)

    def finish(bk: DataFrame, pairN: DataFrame): DataFrame = {
      val nOrders = broadcast(bk.agg(count(lit(1)).as("n_orders")))
      val itemN = bk
        .select(explode(col("parts")).as("part"))
        .groupBy(col("part")).agg(count(lit(1)).as("n_item"))
      pairN
        .join(itemN.select(col("part").as("part_a"), col("n_item").as("n_a")), "part_a")
        .join(itemN.select(col("part").as("part_b"), col("n_item").as("n_b")), "part_b")
        .crossJoin(nOrders)
        .select(col("part_a"), col("part_b"), col("n_pair"), col("n_a"), col("n_b"),
          expr("(n_pair * 1000000) div n_orders").as("support_ppm"),
          expr("(n_pair * 1000000) div n_a").as("confidence_ppm"),
          expr("(n_pair * n_orders * 1000000) div (n_a * n_b)").as("lift_ppm"))
        .orderBy(col("lift_ppm").desc, col("part_a").asc, col("part_b").asc)
        .limit(BasketTopK)
    }

    def base: DataFrame = {
      val bk = baskets
      val pairN = bk
        .select(explode(
          graft.functions.CombinationPairs.combinationPairs(col("parts"))).as("p"))
        .groupBy(col("p.a").as("part_a"), col("p.b").as("part_b"))
        .agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= MinPairSupport)
      finish(bk, pairN)
    }

    def hashpre: DataFrame = {
      val bk = baskets
      def exploded = bk.select(explode(
        graft.functions.CombinationPairs.combinationPairs(col("parts"))).as("p"))
      val hot = exploded
        .select(xxhash64(col("p.a"), col("p.b")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= MinPairSupport)
        .select(col("h"))
      val pairN = exploded
        .join(broadcast(hot), xxhash64(col("p.a"), col("p.b")) === col("h"), "left_semi")
        .groupBy(col("p.a").as("part_a"), col("p.b").as("part_b"))
        .agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= MinPairSupport)
      finish(bk, pairN)
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.count()
      val t = (System.nanoTime() - t0) / 1e9
      Checkpoints.releaseAll(spark)
      t
    }
    // equality witness first (sorted rows)
    val a = base.collect().map(_.toString).sorted
    val b = hashpre.collect().map(_.toString).sorted
    Checkpoints.releaseAll(spark)
    println(s"MBPROBE rows_equal=${a.sameElements(b)} n=${a.length}")
    time(base); time(hashpre) // warm both
    val acc = collection.mutable.Map("base" -> Vector.empty[Double],
                                     "hashpre" -> Vector.empty[Double])
    for (_ <- 1 to reps) {
      acc("base") = acc("base") :+ time(base)
      acc("hashpre") = acc("hashpre") :+ time(hashpre)
    }
    def med(xs: Vector[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"MBPROBE base=${med(acc("base"))}%6.3f hashpre=${med(acc("hashpre"))}%6.3f " +
      s"(all base=${acc("base").map(x => f"$x%.2f")} hashpre=${acc("hashpre").map(x => f"$x%.2f")})")
    spark.stop()
  }
}
