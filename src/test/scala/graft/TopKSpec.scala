package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, TopKByCount}

/** The two bounded-state replacements for corpus-shuffling idioms:
  * [[graft.functions.ItemCounts]] (in-row term counting ≡ explode +
  * groupBy(doc, item)) and [[graft.functions.TopKByCount]] (mergeable
  * per-group top-K heap ≡ rank window + filter). Both must be
  * bit-identical to the formulations they replaced. */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val words = Seq("a", "bb", "ccc", "dd", "e", "ff")
    Seq.tabulate(400) { i =>
      (i.toLong, s"g${i % 7}",
       (1 to rnd.nextInt(20)).map(_ => words(rnd.nextInt(words.size)))
         .mkString(" "))
    }.toDF("doc_id", "grp", "text")
  }

  test("ItemCounts ≡ explode + groupBy(doc_id, item) multiset") {
    import spark.implicits._
    val viaExpr = docs
      .select(col("doc_id"), explode(TextFunctions.itemCounts(
        split(col("text"), "\\s+"))).as("e"))
      .select(col("doc_id"), col("e.item"), col("e.n"))
      .as[(Long, String, Long)].collect().toSet
    val viaShuffle = docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("item"))
      .groupBy(col("doc_id"), col("item")).agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(viaExpr == viaShuffle)
    // first-occurrence order within the row, empty array → empty result
    val ordered = spark.sql("SELECT array('b', 'a', 'b', 'c', 'a', 'b') AS ts")
      .select(TextFunctions.itemCounts(col("ts")).as("cs"))
      .selectExpr("transform(cs, e -> concat(e.item, ':', e.n)) AS s")
      .head.getSeq[String](0)
    assert(ordered == Seq("b:3", "a:2", "c:1"))
    val empty = spark.sql("SELECT array() AS ts")
      .select(size(TextFunctions.itemCounts(col("ts").cast("array<string>"))))
    assert(empty.head.getInt(0) == 0)
    // null array propagates; null elements are skipped
    assert(spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS ts")
      .select(TextFunctions.itemCounts(col("ts"))).head.isNullAt(0))
    val withNull = spark
      .sql("SELECT array('x', CAST(NULL AS STRING), 'x') AS ts")
      .select(TextFunctions.itemCounts(col("ts")).as("cs"))
      .selectExpr("transform(cs, e -> concat(e.item, ':', e.n)) AS s")
      .head.getSeq[String](0)
    assert(withNull == Seq("x:2"))
  }

  test("TopKByCount ≡ row_number window + filter, including merge paths") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // aggregated (grp, item, cnt, payload) table, unique item per grp
    val base = docs
      .select(col("grp"), explode(TextFunctions.itemCounts(
        split(col("text"), "\\s+"))).as("e"))
      .groupBy(col("grp"), col("e.item").as("item"))
      .agg(sum(col("e.n")).as("cnt"), count(lit(1)).as("df"))
    for (k <- Seq(1, 3, 100)) { // 100 > per-group domain: keep-all path
      val viaWindow = base
        .withColumn("rnk", row_number().over(Window.partitionBy(col("grp"))
          .orderBy(col("cnt").desc, col("item").asc)))
        .filter(col("rnk") <= k)
        .select(col("grp"), col("rnk").cast("long"), col("item"),
                col("cnt"), col("df"))
        .as[(String, Long, String, Long, Long)].collect().toSet
      // repartition(13) forces multi-partition partials so merge() runs
      val viaHeap = base.repartition(13)
        .groupBy(col("grp"))
        .agg(TopKByCount.topKByCount(col("cnt"), col("item"), col("df"), k)
          .as("top"))
        .select(col("grp"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("grp"), (col("pos") + 1).cast("long"),
                col("e.tag"), col("e.count"), col("e.payload"))
        .as[(String, Long, String, Long, Long)].collect().toSet
      assert(viaHeap == viaWindow, s"k=$k")
    }
  }
}
