package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Tables.t` caches the resolved DataFrame per (session, dir, table) —
  * `spark.read.parquet` re-lists files and re-reads footers per call,
  * which the bench protocol pays per rep. The cache must never serve a
  * stale FileIndex: an overwrite of the table path bumps the directory
  * mtime, which is the staleness guard. */
class TableCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("t() serves the same plan twice, but refreshes after an overwrite") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tcache").toString
    try {
      Seq((1L, "a"), (2L, "b")).toDF("id", "s")
        .write.mode("overwrite").parquet(s"$dir/fixture.parquet")
      val first = graft.operators.Tables.t(spark, dir, "fixture")
      assert(first.count() == 2)
      // same session + unchanged file -> the cached instance (no re-list)
      assert(graft.operators.Tables.t(spark, dir, "fixture") eq first)

      // rewritten fixture: directory mtime changes, cache must miss.
      // (some filesystems have 1 s mtime granularity — force a tick)
      Thread.sleep(1100)
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
        .write.mode("overwrite").parquet(s"$dir/fixture.parquet")
      val second = graft.operators.Tables.t(spark, dir, "fixture")
      assert(!(second eq first), "stale cached plan served after overwrite")
      assert(second.count() == 3)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }
}
