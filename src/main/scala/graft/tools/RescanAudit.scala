package graft.tools

import org.apache.spark.sql.SparkSession

/** Whole-surface repeated-scan audit (throwaway diagnostic): executes
  * every query at sf0.001 and prints those whose POST-AQE plan scans the
  * same parquet table more than once — the signature of a multi-consumer
  * subtree that AQE's broadcast conversions detached from exchange reuse
  * (the q21 / mad_outliers / q11 finding). Repeats are not automatically
  * wrong (self-joins are legitimate); the list is a review queue. */
object RescanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.operators.Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val table = "(region|nation|customer|supplier|part|orders|lineitem|events|documents|embeddings)\\.parquet".r
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val df = fn(spark, dir)
        df.count()
        val p = df.queryExecution.executedPlan.toString
        val scans = p.split("\n").filter(_.contains("Scan parquet"))
          .flatMap(l => table.findFirstMatchIn(l).map(_.group(1)))
        val dup = scans.groupBy(identity).filter(_._2.length > 1)
        if (dup.nonEmpty)
          println(s"RESCAN $name -> ${dup.map { case (t, v) => s"$t x${v.length}" }.mkString(", ")}")
      } catch { case e: Throwable => println(s"RESCAN_ERR $name ${e.getMessage}") }
      graft.operators.Checkpoints.releaseAll(spark)
    }
    spark.stop()
  }
}
