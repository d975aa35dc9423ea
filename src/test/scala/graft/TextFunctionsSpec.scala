package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Native tokenize/n-gram expressions: bit-equality with the regex-split
  * and HOF formulations they replace, across whitespace edge cases. */
class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Random texts plus every whitespace edge: empty, all-whitespace,
    * leading/trailing/multiple separators, every Java \s byte, multi-byte
    * UTF-8 neighbors, and unicode spaces that \s must NOT split on. */
  private def textFixture = {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val seps = Seq(" ", "\t", "\n", "", "\f", "\r", "  ", " \t\n ")
    val words = Seq("a", "bc", "def", "čau", "日本語", "x1!", "{y}", "z.")
    val random = Seq.fill(300)(
      (1 to rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.size)))
        .mkString(seps(rnd.nextInt(seps.size))))
    val edges = Seq("", " ", "   ", "\t\t", "a", " a", "a ", " a ",
      "a b", "a  b", "\ta\tb\t", "a b", "a b", // NBSP/em-space: NOT \s
      "\r\na\r\nb", "one two three four five")
    (random ++ edges).toDF("text")
  }

  test("WsTokens is bit-identical to split(text, '\\\\s+')") {
    val df = textFixture.select(
      TextFunctions.wsTokens(col("text")).as("native"),
      split(col("text"), "\\s+").as("regex"))
    assert(df.filter(not(col("native") <=> col("regex"))).count() == 0)
    // null propagation
    val n = spark.sql("SELECT CAST(NULL AS STRING) AS t")
      .select(TextFunctions.wsTokens(col("t")).as("c"))
    assert(n.head.isNullAt(0))
  }

  test("NgramsJoined matches both HOF n-gram formulations") {
    val ts = split(col("text"), "\\s+")
    // the indexed-transform form (ngram_vocab / shingles3 shape), n = 2, 3
    for (n <- Seq(2, 3)) {
      val hof = filter(
        transform(ts, (x, i) =>
          when(i + (n - 1) < size(ts),
            concat_ws(" ", (x +: (2 to n).map(k => element_at(ts, i + k))): _*))),
        s => s.isNotNull)
      val df = textFixture.select(
        TextFunctions.ngramsJoined(ts, n).as("native"), hof.as("hof"))
      assert(df.filter(not(col("native") <=> col("hof"))).count() == 0,
        s"n=$n indexed-transform form")
    }
    // the sequence+slice+array_join form (decontam shape), n = 5
    val joined = expr(
      """CASE WHEN size(ts) >= 5
        |  THEN transform(sequence(1, size(ts) - 4),
        |         i -> array_join(slice(ts, i, 5), ' '))
        |  ELSE array() END""".stripMargin)
    val df = textFixture.select(ts.as("ts"))
      .select(TextFunctions.ngramsJoined(col("ts"), 5).as("native"),
              joined.as("hof"))
    assert(df.filter(not(col("native") <=> col("hof"))).count() == 0)
  }

  test("BigramPairs matches the sequence+struct HOF formulation") {
    val df = textFixture
      .select(split(col("text"), "\\s+").as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(TextFunctions.bigramPairs(col("ts")).as("native"),
        expr("transform(sequence(1, size(ts) - 1), " +
             "i -> struct(element_at(ts, i) AS w1, element_at(ts, i + 1) AS w2))")
          .as("hof"))
    assert(df.filter(not(col("native") <=> col("hof"))).count() == 0)
    // below 2 tokens -> empty, like the guarded HOF form
    val one = spark.sql("SELECT array('only') AS ts")
      .select(size(TextFunctions.bigramPairs(col("ts"))).as("n"))
    assert(one.head.getInt(0) == 0)
  }
}
