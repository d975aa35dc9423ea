package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Tables.t` caches the resolved DataFrame per (session, dir, table) —
  * `spark.read.parquet` re-lists files and re-reads footers per call,
  * which the bench protocol pays per rep. The cache must never serve a
  * stale FileIndex: the staleness guard is a content signature over the
  * table directory's listing (names + sizes + mtimes), so even a rewrite
  * landing within the same 1 s mtime tick is caught — Spark part-file
  * names embed a fresh UUID per write, which changes the signature
  * regardless of timestamp granularity. (The pre-r11 guard was directory
  * mtime alone; this spec needed a `Thread.sleep(1100)` to dodge the
  * granularity hole the signature now closes — the sleep is gone, so
  * this test IS the same-tick-rewrite regression test.) */
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

      // rewritten fixture, possibly within the same mtime tick: the
      // listing signature (fresh part-file UUIDs) must force a miss
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
