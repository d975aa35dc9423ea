package graft.tools
import org.apache.spark.sql.SparkSession

/** Per-query wall-clock breakdown: DataFrame construction + analysis,
  * optimization/physical planning, and execution — separates Catalyst
  * driver time (paid per bench rep, since the protocol rebuilds the
  * plan) from dataflow time. Usage: Phases <reps> <query>... */
object Phases {
  def main(args: Array[String]): Unit = {
    val reps = args.head.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Sessions.ramLocalDir("graft_phases_local"))
      .config(graft.operators.Tables.NanosConf, "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
              graft.Sessions.ObjectAggFallbackGroups)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/region.parquet").count()
    for (n <- args.tail) {
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, dir)
        df.queryExecution.analyzed // force analysis
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // optimize + plan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        graft.operators.Checkpoints.releaseAll(spark)
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"PHASES $n%-24s build+analyze=${med(t.map(_._1))}%6.3f  plan=${med(t.map(_._2))}%6.3f  exec=${med(t.map(_._3))}%6.3f")
    }
    spark.stop()
  }
}
