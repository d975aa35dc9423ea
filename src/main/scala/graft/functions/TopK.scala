package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One retained entry: the ranking count, its string tag (unique within a
  * group — both call shapes aggregate an already-distinct table), and one
  * carried payload long. */
final case class TopKEntry(count: Long, tag: UTF8String, payload: Long)

/**
 * Bounded per-group top-K by count as a native
 * [[TypedImperativeAggregate]] [EXT] — the scale-correct replacement for
 * the `row_number() OVER (PARTITION BY g ORDER BY c DESC) <= K` idiom
 * when the per-group domain is large: a rank window SORTS each group's
 * ENTIRE domain (for a per-language bigram vocabulary that is the whole
 * vocabulary through one task per language), while this aggregate keeps
 * a K-entry min-heap per group, merges heaps associatively, and ships
 * only K-sized partial buffers through the shuffle — the same mergeable
 * bounded-state algebra as [[HllSketchAgg]], applied to ranking.
 *
 * Ordering is the total order (count DESC, tag ASC): ties break by tag,
 * and tags are unique within a group at both call sites, so heap-merge
 * order cannot affect the result — bit-identical to the window + filter
 * formulation by construction. `eval` returns the K survivors best-first
 * as `array<struct<tag, count, payload>>`; posexplode turns the position
 * into the dense rank.
 */
case class TopKByCount(
    count: Expression,
    tag: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[TopKEntry]] {

  override def children: Seq[Expression] = Seq(count, tag, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tag", StringType),
    StructField("count", LongType, nullable = false),
    StructField("payload", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk_by_count"

  // head = the WORST retained entry (lowest count, then largest tag), so
  // the replace test is one peek
  private def worstFirst: java.util.Comparator[TopKEntry] =
    (a: TopKEntry, b: TopKEntry) => {
      val c = java.lang.Long.compare(a.count, b.count)
      if (c != 0) c else b.tag.compareTo(a.tag)
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[TopKEntry] =
    new java.util.PriorityQueue[TopKEntry](k + 1, worstFirst)

  private def offer(b: java.util.PriorityQueue[TopKEntry], e: TopKEntry): Unit =
    if (b.size < k) b.add(e)
    else if (worstFirst.compare(e, b.peek) > 0) { b.poll(); b.add(e) }

  override def update(
      b: java.util.PriorityQueue[TopKEntry],
      input: InternalRow): java.util.PriorityQueue[TopKEntry] = {
    val c0 = count.eval(input)
    if (c0 != null) {
      val c = c0.asInstanceOf[Long]
      // Hot path: with the heap full, almost every row loses to the
      // current worst on count alone — reject it with ONE long compare,
      // no tag eval, no TopKEntry/UTF8String allocation. Rows a null tag
      // would have skipped lose here too (they cannot enter the heap),
      // so deferring the tag eval never changes the result.
      if (b.size >= k && c < b.peek.count) return b
      val t = tag.eval(input)
      if (t != null) {
        val tu = t.asInstanceOf[UTF8String]
        // count ties resolve on tag ASC (worstFirst: b.tag.compareTo(a))
        if (b.size >= k && c == b.peek.count && b.peek.tag.compareTo(tu) <= 0)
          return b
        val p = payload.eval(input)
        // clone: the UTF8String points into a reused row buffer
        offer(b, TopKEntry(c, tu.clone(),
          if (p == null) 0L else p.asInstanceOf[Long]))
      }
    }
    b
  }

  override def merge(
      b: java.util.PriorityQueue[TopKEntry],
      o: java.util.PriorityQueue[TopKEntry]): java.util.PriorityQueue[TopKEntry] = {
    val it = o.iterator()
    while (it.hasNext) offer(b, it.next())
    b
  }

  override def eval(b: java.util.PriorityQueue[TopKEntry]): Any = {
    // Non-destructive: eval can be invoked repeatedly on a live buffer
    // (e.g. if this aggregate is ever used in a window frame), so sort a
    // snapshot instead of draining the queue.
    val arr = b.toArray(new Array[TopKEntry](b.size))
    java.util.Arrays.sort(arr, worstFirst.reversed()) // best-first
    new GenericArrayData(arr.map(e =>
      InternalRow(e.tag, e.count, e.payload): Any))
  }

  override def serialize(b: java.util.PriorityQueue[TopKEntry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    val it = b.iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.count)
      out.writeLong(e.payload)
      val bytes = e.tag.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[TopKEntry] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val c = in.readLong()
      val p = in.readLong()
      val len = in.readInt()
      val tb = new Array[Byte](len)
      in.readFully(tb)
      b.add(TopKEntry(c, UTF8String.fromBytes(tb), p))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByCount =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByCount =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(count = newChildren(0), tag = newChildren(1), payload = newChildren(2))
}

object TopKByCount {
  /** Column-level bounded top-K: array of (tag, count, payload) structs,
    * best-first by (count DESC, tag ASC). */
  def topKByCount(count: Column, tag: Column, payload: Column, k: Int): Column =
    GraftShims.column(TopKByCount(
      GraftShims.expression(count), GraftShims.expression(tag),
      GraftShims.expression(payload), k).toAggregateExpression())
}
