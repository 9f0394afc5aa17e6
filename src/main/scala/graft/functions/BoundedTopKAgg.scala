package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a partial aggregation.
  *
  * The generic per-group top-k (`row_number() OVER (PARTITION BY g
  * ORDER BY s) <= k`) shuffles EVERY scored row to its group's
  * partition and sorts there — for the flat-scan ANN rankers
  * ([[graft.llm.Similarity.topKCosine]], [[graft.llm.Sq]]) that is the
  * whole |corpus|·|queries| scored relation landing on |queries| tasks
  * (one task per query holds |corpus| rows), and for the per-host
  * crawl cap ([[graft.llm.Urls.hostCap]]) it is the Zipf-head host
  * landing on one task. These aggregates keep AT MOST k entries per
  * group per map task instead: update inserts into a k-bounded sorted
  * buffer, the shuffle carries ≤ k·partitions rows per group, and
  * merge folds sorted buffers with early exit. Same
  * `TypedImperativeAggregate` / `ObjectHashAggregate` machinery as
  * [[OrderedTensorAgg]] — map-side combinable exactly like
  * `collect_list`, asserted in PlanAuditSpec.
  *
  * Determinism: the orderings below are total on the stored values
  * (score ties break on the id, duplicate ids assumed absent — both
  * rankers and the host cap key on unique ids), so the merged top-k is
  * independent of partitioning and merge order, and matches the window
  * arm bit-for-bit: comparisons happen on the EXACT unrounded doubles
  * the window sorted (NaN greatest, like Spark's double ordering), and
  * rounding stays where it was — on output.
  */
private[graft] abstract class BoundedTopKBufferAgg extends OrderedBufferAgg {

  def k: Int

  /** Negative when `a` ranks strictly before (beats) `b`; a total
    * order on distinct entries. */
  protected def rankCompare(a: InternalRow, b: InternalRow): Int

  /** Insert keeping the buffer sorted best-first and `length <= k`. */
  protected final def insertBounded(
      buffer: ArrayBuffer[InternalRow], row: InternalRow): ArrayBuffer[InternalRow] = {
    if (buffer.length >= k && rankCompare(row, buffer.last) >= 0) return buffer
    var lo = 0
    var hi = buffer.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (rankCompare(row, buffer(mid)) < 0) hi = mid else lo = mid + 1
    }
    buffer.insert(lo, row)
    if (buffer.length > k) buffer.remove(buffer.length - 1)
    buffer
  }

  override def update(
      buffer: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    val fields = children
    val vals = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      vals(i) = InternalRow.copyValue(fields(i).eval(input))
      i += 1
    }
    insertBounded(buffer, new GenericInternalRow(vals))
  }

  override def merge(
      buffer: ArrayBuffer[InternalRow],
      other: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    // both sides are sorted best-first: once an entry cannot enter a
    // full buffer, no later entry of `other` can either
    var i = 0
    var open = true
    while (open && i < other.length) {
      val e = other(i)
      if (buffer.length >= k && rankCompare(e, buffer.last) >= 0) open = false
      else { insertBounded(buffer, e); i += 1 }
    }
    buffer
  }
}

/** Top-k (score DESC, id ASC) as ARRAY<STRUCT<s: DOUBLE, id: BIGINT>>
  * in rank order — the ANN serving shape: posexplode the result and
  * `pos + 1` IS the rank. Score ordering matches Spark's descending
  * double sort exactly (NaN first, as the greatest double; a null
  * score ranks last, as `desc` NullsLast does); ties break ascending
  * on id (null id first, as `asc` NullsFirst does). */
private[graft] case class TopKScoreIdAgg(
    k: Int,
    score: Expression,
    id: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BoundedTopKBufferAgg {
  require(k >= 1, s"k must be >= 1, got $k")

  override protected def entryFields: Seq[Expression] = Seq(score, id)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("s", DoubleType, nullable = true),
      StructField("id", LongType, nullable = true))),
    containsNull = false)

  /** The single ordering definition, over unboxed candidate values —
    * both [[rankCompare]] (row vs row) and the allocation-free update
    * fast path (primitives vs row) route through it, so the two can
    * never drift. */
  private def compareEntry(
      sNull: Boolean, s: Double, iNull: Boolean, i: Long, b: InternalRow): Int = {
    val bn = b.isNullAt(0)
    if (sNull != bn) return if (sNull) 1 else -1 // null score last (desc NullsLast)
    if (!sNull) {
      // descending; Double.compare puts NaN above +Inf, matching Spark
      val c = java.lang.Double.compare(b.getDouble(0), s)
      if (c != 0) return c
    }
    val bin = b.isNullAt(1)
    if (iNull != bin) return if (iNull) -1 else 1 // null id first (asc NullsFirst)
    if (iNull) 0 else java.lang.Long.compare(i, b.getLong(1))
  }

  override protected def rankCompare(a: InternalRow, b: InternalRow): Int = {
    val an = a.isNullAt(0)
    val ain = a.isNullAt(1)
    compareEntry(an, if (an) 0.0 else a.getDouble(0),
      ain, if (ain) 0L else a.getLong(1), b)
  }

  /** Allocation-free fast path: on a full buffer, most input rows lose
    * to the current k-th entry — compare primitives BEFORE building
    * the entry row (the generic update allocates per input row). */
  override def update(
      buffer: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    val s = score.eval(input)
    val i = id.eval(input)
    val sNull = s == null
    val iNull = i == null
    if (buffer.length >= k && compareEntry(
      sNull, if (sNull) 0.0 else s.asInstanceOf[Double],
      iNull, if (iNull) 0L else i.asInstanceOf[Long], buffer.last) >= 0) buffer
    else insertBounded(buffer, new GenericInternalRow(Array[Any](s, i)))
  }

  override def eval(buffer: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(buffer.toArray[Any])

  override def prettyName: String = "top_k_score_id"
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKScoreIdAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKScoreIdAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

/** [[TopKScoreIdAgg]] with one BIGINT payload column riding along —
  * ARRAY<STRUCT<s: DOUBLE, id: BIGINT, p: BIGINT>> in (score DESC,
  * id ASC) rank order. The payload NEVER participates in the ordering
  * (identical entries modulo payload cannot exist — ids are unique per
  * group), it just avoids a second id-keyed join to recover a carried
  * aggregate (the BM25 shape: (doc_id, n_hit_terms) per query — a
  * re-join would re-execute the whole scored subtree per reference). */
private[graft] case class TopKScoreIdPayloadAgg(
    k: Int,
    score: Expression,
    id: Expression,
    payload: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BoundedTopKBufferAgg {
  require(k >= 1, s"k must be >= 1, got $k")

  override protected def entryFields: Seq[Expression] = Seq(score, id, payload)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("s", DoubleType, nullable = true),
      StructField("id", LongType, nullable = true),
      StructField("p", LongType, nullable = true))),
    containsNull = false)

  /** Same total order as [[TopKScoreIdAgg]]: (score DESC NullsLast,
    * id ASC NullsFirst); the payload is cargo. */
  private def compareEntry(
      sNull: Boolean, s: Double, iNull: Boolean, i: Long, b: InternalRow): Int = {
    val bn = b.isNullAt(0)
    if (sNull != bn) return if (sNull) 1 else -1
    if (!sNull) {
      val c = java.lang.Double.compare(b.getDouble(0), s)
      if (c != 0) return c
    }
    val bin = b.isNullAt(1)
    if (iNull != bin) return if (iNull) -1 else 1
    if (iNull) 0 else java.lang.Long.compare(i, b.getLong(1))
  }

  override protected def rankCompare(a: InternalRow, b: InternalRow): Int = {
    val an = a.isNullAt(0)
    val ain = a.isNullAt(1)
    compareEntry(an, if (an) 0.0 else a.getDouble(0),
      ain, if (ain) 0L else a.getLong(1), b)
  }

  /** Allocation-free reject before evaluating/boxing the payload. */
  override def update(
      buffer: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    val s = score.eval(input)
    val i = id.eval(input)
    val sNull = s == null
    val iNull = i == null
    if (buffer.length >= k && compareEntry(
      sNull, if (sNull) 0.0 else s.asInstanceOf[Double],
      iNull, if (iNull) 0L else i.asInstanceOf[Long], buffer.last) >= 0) buffer
    else insertBounded(buffer,
      new GenericInternalRow(Array[Any](s, i, InternalRow.copyValue(payload.eval(input)))))
  }

  override def eval(buffer: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(buffer.toArray[Any])

  override def prettyName: String = "top_k_score_id_payload"
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKScoreIdPayloadAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKScoreIdPayloadAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), payload = newChildren(2))
}

/** The k smallest non-null BIGINT values of a group, ascending, as
  * ARRAY<BIGINT> — the crawl-cap shape (smallest-id survivors per
  * host). Nulls are skipped: a null id cannot survive the equi-join
  * the caller keeps survivors with, so admitting it would only
  * displace a real survivor. */
private[graft] case class SmallestKLongsAgg(
    k: Int,
    id: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BoundedTopKBufferAgg {
  require(k >= 1, s"k must be >= 1, got $k")

  override protected def entryFields: Seq[Expression] = Seq(id)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def rankCompare(a: InternalRow, b: InternalRow): Int =
    java.lang.Long.compare(a.getLong(0), b.getLong(0))

  override def update(
      buffer: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    val v = id.eval(input)
    if (v == null) buffer
    // allocation-free reject: once full, most rows lose to the k-th id
    else if (buffer.length >= k &&
      v.asInstanceOf[Long] >= buffer.last.getLong(0)) buffer
    else insertBounded(buffer, new GenericInternalRow(Array[Any](v)))
  }

  override def eval(buffer: ArrayBuffer[InternalRow]): Any = {
    val out = new Array[Any](buffer.length)
    var i = 0
    while (i < buffer.length) {
      out(i) = java.lang.Long.valueOf(buffer(i).getLong(0))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "smallest_k_longs"
  override def withNewMutableAggBufferOffset(newOffset: Int): SmallestKLongsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SmallestKLongsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(id = newChildren(0))
}

object BoundedTopK {

  /** ARRAY<STRUCT<s, id>> of the k best (score DESC, id ASC) entries,
    * rank-ordered. */
  def topKByScore(k: Int, score: Column, id: Column): Column =
    ColumnShim.column(TopKScoreIdAgg(k,
      ColumnShim.expression(score), ColumnShim.expression(id)).toAggregateExpression())

  /** ARRAY<STRUCT<s, id, p>> of the k best (score DESC, id ASC)
    * entries with a BIGINT payload riding along, rank-ordered. */
  def topKByScorePayload(k: Int, score: Column, id: Column, payload: Column): Column =
    ColumnShim.column(TopKScoreIdPayloadAgg(k,
      ColumnShim.expression(score), ColumnShim.expression(id),
      ColumnShim.expression(payload)).toAggregateExpression())

  /** ARRAY<BIGINT> of the k smallest non-null values, ascending. */
  def smallestLongs(k: Int, id: Column): Column =
    ColumnShim.column(SmallestKLongsAgg(k,
      ColumnShim.expression(id)).toAggregateExpression())
}
