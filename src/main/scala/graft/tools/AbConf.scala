package graft.tools
import org.apache.spark.sql.SparkSession

/** Throwaway A/B harness for RUNTIME-settable SQL confs (not part of the
  * library surface): times each named query under conf=off vs conf=on,
  * interleaved medians. Usage: AbConf <reps> <confKey=val|val> <query>...
  * — e.g. `AbConf 7 spark.sql.adaptive.enabled=false q11_important_parts`
  * times each query with the session default vs with the override. */
object AbConf {
  def main(args: Array[String]): Unit = {
    val reps = args(0).toInt
    val Array(key, v) = args(1).split("=", 2)
    val queries = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Sessions.ramLocalDir("graft_ab_local"))
      .config(graft.operators.Tables.NanosConf, "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").collect()
    val base = spark.conf.get(key)
    def time(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      graft.operators.Checkpoints.releaseAll(spark)
      t
    }
    for (n <- queries) { time(n); time(n) } // warm both codegen paths
    val acc = collection.mutable.Map.empty[(String, Boolean), Vector[Double]]
      .withDefaultValue(Vector())
    for (_ <- 1 to reps; n <- queries; on <- Seq(false, true)) {
      spark.conf.set(key, if (on) v else base)
      acc((n, on)) = acc((n, on)) :+ time(n)
    }
    for (n <- queries) {
      def med(on: Boolean) = { val xs = acc((n, on)).sorted; xs(xs.size / 2) }
      println(f"ABCONF $n%-24s base=${med(false)}%6.3f  $key=$v: ${med(true)}%6.3f")
    }
    spark.stop()
  }
}
