package graft.tools
import org.apache.spark.sql.SparkSession
/** r17 throwaway: dump the row-local signature stage plan (the
  * stream_minhash stateless leg) under both forms for plans/r17. */
object PlanGrab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.operators.Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    def dump(tag: String): Unit = {
      val docs = graft.operators.Tables.t(spark, dir, "documents")
      val df = graft.operators.Dedup.bandedSignaturesRowLocalOf(docs)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
        .replaceAll("#\\d+L?", "#x").replaceAll("file:[^\\s,\\]\\)]+", "file:<path>")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/r17/stream_minhash_sigstage_$tag.txt"), txt)
      println(s"wrote $tag")
    }
    spark.conf.set("spark.graft.minhashHof", "true"); dump("before")
    spark.conf.unset("spark.graft.minhashHof"); dump("after")
    spark.stop()
  }
}
