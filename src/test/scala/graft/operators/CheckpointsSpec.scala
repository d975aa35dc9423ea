package graft.operators

import java.nio.file.Files

import org.apache.spark.SparkException
import org.scalatest.funsuite.AnyFunSuite

/**
 * The cluster-durability contract of [[Checkpoints]] (VERDICT r5 #1):
 * with `spark.graft.checkpointDir` set, every iterative operator's
 * lineage cut is backed by re-readable checkpoint FILES, so losing every
 * executor-cached block (= losing an executor on a real cluster) leaves
 * the state recomputable. The default localCheckpoint mode demonstrably
 * does NOT survive that loss — which is exactly why the flag exists.
 *
 * Block loss is simulated the only way local mode allows: unpersisting
 * every persistent RDD with blocking=true. For a locally-checkpointed
 * dataset that is precisely the cluster failure (truncated lineage +
 * missing blocks = SparkException); for a reliably-checkpointed one it
 * is a no-op because the data lives in the checkpoint directory.
 */
class CheckpointsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def dropAllBlocks(): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

  private def withReliable[A](body: String => A): A = {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try body(dir)
    finally spark.conf.unset(Checkpoints.DirConf)
  }

  private def craftedPairs = {
    import spark.implicits._
    // two components: a 6-node path (diameter > 1 → multi-round loop)
    // and a triangle
    ((0L until 5L).map(i => (i, i + 1)) ++ Seq((10L, 11L), (11L, 12L), (10L, 12L)))
      .toDF("doc_a", "doc_b")
  }

  test("default mode: block loss kills a locally-checkpointed cut (the cluster hazard)") {
    val cut = Checkpoints.cut(spark.range(100).toDF("id"))
    assert(cut.count() === 100L)
    dropAllBlocks()
    // truncated lineage + missing blocks: the job CANNOT recompute —
    // this is what an executor loss does to localCheckpoint on a cluster
    val ex = intercept[SparkException](cut.count())
    assert(ex.getMessage.toLowerCase.contains("checkpoint"))
  }

  test("reliable mode: the same loss is survivable — data re-read from the checkpoint dir") {
    withReliable { dir =>
      val cut = Checkpoints.cut(spark.range(100).toDF("id"))
      assert(cut.count() === 100L)
      // checkpoint files actually landed under the configured directory
      val wrote = Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .count()
      assert(wrote > 0, s"no checkpoint part files under $dir")
      dropAllBlocks()
      assert(cut.count() === 100L)
    }
  }

  test("CC loop in reliable mode: same fixpoint, and its final state survives total block loss") {
    val expect = Dedup.componentsOf(craftedPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    withReliable { _ =>
      val comps = Dedup.componentsOf(craftedPairs)
      val got = comps.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(got === expect)
      // the returned plan reads the LAST round's checkpointed label
      // state: dropping every cached block mid-pipeline (an executor
      // death between the loop and its consumer) must not lose it
      dropAllBlocks()
      val again = comps.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(again === expect)
    }
  }

  test("pagerank in reliable mode matches the default-mode ranks on sf0.001") {
    val expect = Graph.graphPagerank(spark, graft.TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val got = withReliable { _ =>
      Graph.graphPagerank(spark, graft.TestSpark.Sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    }
    assert(got === expect)
  }
}
