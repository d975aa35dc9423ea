package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native tokenize / n-gram expressions for the text-analysis hot path.
 *
 * The whole text family tokenizes with `split(text, "\\s+")` and builds
 * n-grams with higher-order `transform` lambdas. Both are the per-row
 * bottleneck at corpus scale: `StringSplit` compiles+runs a Java regex
 * per document, and HOFs evaluate an interpreted lambda closure per
 * array element (they are CodegenFallback — the dominant cost the bench
 * attributes to the n-gram family). These expressions do the same work
 * as tight byte/array loops with `doGenCode`, so they fuse into
 * whole-stage codegen like any built-in (the [[DotProduct]] /
 * [[PqAssign]] treatment applied to strings).
 *
 * Equivalences are BIT-EXACT and spec-pinned (TextFunctionsSpec):
 *  - [[WsTokens]] ≡ `split(text, "\\s+")`: Java `\s` is exactly the six
 *    ASCII bytes `[ \t\n\x0B\f\r]`, and ASCII bytes never occur inside a
 *    multi-byte UTF-8 sequence, so splitting on whitespace-byte RUNS over
 *    the raw UTF-8 — leading empty token when the text starts with
 *    whitespace, trailing empty token when it ends with one (Java
 *    `split(re, -1)` semantics) — reproduces the regex split without
 *    decoding, copying, or regex machinery.
 *  - [[NgramsJoined]] ≡ `filter(transform(ts, (x, i) => when(i+n-1 <
 *    size(ts), concat_ws(" ", x, ts[i+2], …, ts[i+n]))), notNull)` and
 *    the `transform(sequence(…), i -> array_join(slice(ts, i, n), ' '))`
 *    form: space-joined windows, null elements skipped like
 *    `concat_ws`/`array_join`.
 *  - [[BigramPairs]] ≡ `transform(sequence(1, size(ts)-1),
 *    i -> struct(ts[i] AS w1, ts[i+1] AS w2))`.
 */
case class WsTokens(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ws_tokens"

  override def nullSafeEval(s: Any): Any =
    WsTokens.split(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WsTokens.split($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WsTokens {
  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Java `text.split("\\s+", -1)` over raw UTF-8 bytes: tokens are
    * zero-copy slices of one shared byte array. Called from generated
    * code. */
  def split(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](8)
    var pos = 0 // start of the current token
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        var j = i + 1
        while (j < n && isWs(bytes(j))) j += 1
        out.add(UTF8String.fromBytes(bytes, pos, i - pos))
        pos = j
        i = j
      } else i += 1
    }
    out.add(UTF8String.fromBytes(bytes, pos, n - pos))
    new GenericArrayData(out.toArray)
  }
}

case class NgramsJoined(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "NgramsJoined needs n >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  override def nullSafeEval(a: Any): Any =
    NgramsJoined.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NgramsJoined.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramsJoined {
  private val Space = UTF8String.fromString(" ")

  /** Space-joined n-token windows (empty result below n tokens); null
    * elements are skipped by `concatWs` exactly like `concat_ws` /
    * `array_join` in the HOF forms this replaces. Called from generated
    * code — named `compute`, NOT `eval`: a companion method named `eval`
    * collides with `Expression.eval(InternalRow)`, so Scala emits no
    * static forwarder and janino fails to resolve the call, silently
    * disabling whole-stage codegen for every plan containing this
    * expression (the fallback is a per-plan WARN, not an error). */
  def compute(ts: ArrayData, n: Int): ArrayData = {
    val len = ts.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var k = 0
      while (k < n) {
        window(k) = if (ts.isNullAt(i + k)) null else ts.getUTF8String(i + k)
        k += 1
      }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class BigramPairs(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got $t")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType), StructField("w2", StringType))),
    containsNull = false)
  override def prettyName: String = "graft_bigram_pairs"

  override def nullSafeEval(a: Any): Any =
    BigramPairs.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BigramPairs.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramPairs {
  /** Adjacent (w1, w2) token pairs as struct rows (empty below 2
    * tokens). Called from generated code — named `compute`, not `eval`
    * (see [[NgramsJoined.compute]] for the forwarder-clash rationale). */
  def compute(ts: ArrayData): ArrayData = {
    val len = ts.numElements()
    if (len < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - 1)
    var prev: AnyRef = if (ts.isNullAt(0)) null else ts.getUTF8String(0)
    var i = 1
    while (i < len) {
      val cur: AnyRef = if (ts.isNullAt(i)) null else ts.getUTF8String(i)
      out(i - 1) = InternalRow(prev, cur)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class ItemCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got $t")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("n", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_item_counts"

  override def nullSafeEval(a: Any): Any =
    ItemCounts.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ItemCounts.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ItemCounts {
  /** Per-row distinct items with multiplicities, first-occurrence order
    * (deterministic; downstream aggregates are order-insensitive
    * anyway). Replaces an explode + corpus-sized groupBy(doc, item)
    * SHUFFLE with in-row work: the per-document term-count table every
    * tf/df aggregate starts from. Null elements are skipped. Called from
    * generated code — named `compute`, not `eval` (the
    * [[NgramsJoined.compute]] forwarder-clash rationale). */
  def compute(ts: ArrayData): ArrayData = {
    val len = ts.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
    var i = 0
    while (i < len) {
      if (!ts.isNullAt(i)) {
        val s = ts.getUTF8String(i)
        val c = counts.get(s)
        // clone on first insert: the UTF8String may point into a reused
        // buffer; counted keys outlive the element cursor. put on an
        // existing key keeps the original (cloned) key object.
        if (c == null) counts.put(s.clone(), 1L)
        else counts.put(s, c + 1L)
      }
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(e.getKey, e.getValue.longValue())
      k += 1
    }
    new GenericArrayData(out)
  }
}

object TextFunctions {
  /** Column-level whitespace tokenizer ≡ `split(text, "\\s+")`. */
  def wsTokens(text: Column): Column =
    GraftShims.column(WsTokens(GraftShims.expression(text)))

  /** Column-level per-row item multiplicities (item, n) over a string
    * array, first-occurrence order. */
  def itemCounts(arr: Column): Column =
    GraftShims.column(ItemCounts(GraftShims.expression(arr)))

  /** Column-level space-joined n-grams over a token array. */
  def ngramsJoined(tokens: Column, n: Int): Column =
    GraftShims.column(NgramsJoined(GraftShims.expression(tokens), n))

  /** Column-level adjacent-pair structs (w1, w2) over a token array. */
  def bigramPairs(tokens: Column): Column =
    GraftShims.column(BigramPairs(GraftShims.expression(tokens)))
}
