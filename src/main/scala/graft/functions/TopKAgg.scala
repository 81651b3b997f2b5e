package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshims.SparkShims
import org.apache.spark.sql.types._

/** Bounded top-k aggregation state: at most k (score, id) pairs,
  * ordered worst-first so eviction is O(log k). In `distinct` mode a
  * companion hash set mirrors the heap's ids (maintained on
  * insert/evict) so membership is O(1) instead of an O(k) heap scan
  * per arriving row — at k=256 over a streaming corpus that scan was
  * ~256 comparisons per document.
  */
final class TopKBuffer(val k: Int, val distinct: Boolean = false) {
  // min-heap on (score, then id desc so the *larger* id is evicted
  // first — final order prefers smaller ids on ties)
  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (s, -i) }.reverse
  val heap = collection.mutable.PriorityQueue.empty[(Double, Long)](ord)
  private val ids: java.util.HashSet[Long] =
    if (distinct) new java.util.HashSet[Long]() else null

  /** O(1); only meaningful (and only maintained) in distinct mode. */
  def containsId(id: Long): Boolean = distinct && ids.contains(id)

  def insert(score: Double, id: Long): Unit = {
    if (heap.size < k) {
      heap.enqueue((score, id))
      if (distinct) ids.add(id)
    } else {
      val (ws, wi) = heap.head
      if (score > ws || (score == ws && id < wi)) {
        heap.dequeue(); heap.enqueue((score, id))
        if (distinct) { ids.remove(wi); ids.add(id) }
      }
    }
  }

  /** Best-first: score desc, id asc on ties. */
  def sorted: Array[(Double, Long)] =
    heap.toArray.sortBy { case (s, i) => (-s, i) }
}

/** Top-k (score, id) rows per group as a single bounded-state
  * aggregate (SURVEY §6): partial aggregation keeps at most k pairs
  * per group per partition, so only k·partitions rows shuffle —
  * unlike the window row_number() formulation, which sorts and
  * shuffles every row of every group. The scale shape for
  * "top 3 per brand over 100 TB".
  *
  * Deterministic: ties on score break toward the smaller id, same
  * contract as `ORDER BY score DESC, id` + LIMIT k.
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    distinctIds: Boolean = false)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, distinctIds)

  // distinct-id mode (the KMV sketch contract): a value already IN
  // the sketch is skipped — the heap then holds the k best DISTINCT
  // ids. A re-arrival of an evicted id is rejected by the score test
  // alone (eviction implies k better ids are present), so the O(1)
  // hash-set membership check is the complete dedup. Merge stays
  // associative and commutative: both sides hold distinct ids and
  // put() dedups across them.
  private def put(buf: TopKBuffer, s: Double, i: Long): Unit =
    if (!distinctIds || !buf.containsId(i)) buf.insert(s, i)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      put(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach { case (s, i) => put(buf, s, i) }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = buf.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val items = buf.heap.toArray
    val bb = ByteBuffer.allocate(4 + items.length * 16)
    bb.putInt(items.length)
    items.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k, distinctIds)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = cs(0), idExpr = cs(1))
}

object TopKAgg {
  /** Column API: `top_k(score, id, k)` → array<struct<score,id>>. */
  def top_k(score: Column, id: Column, k: Int): Column =
    SparkShims.column(
      TopKAgg(SparkShims.expression(score), SparkShims.expression(id), k)
        .toAggregateExpression())

  /** `top_k` over DISTINCT ids in bounded state — the KMV-sketch
    * primitive: duplicates of an id count once, state never exceeds
    * k entries (no exact-distinct pre-shuffle, no unbounded set).
    */
  def top_k_distinct(score: Column, id: Column, k: Int): Column =
    SparkShims.column(
      TopKAgg(SparkShims.expression(score), SparkShims.expression(id), k,
        distinctIds = true)
        .toAggregateExpression())
}
