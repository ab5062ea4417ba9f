package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/**
 * Bounded top-k heap of (distance, label) pairs.
 *
 * Ordering: best = smallest (distance, label) when `ascending` (L2, L1,
 * ...), best = (largest distance, smallest label) for inner-product
 * style metrics. Ties on distance break toward the smaller label so
 * results are deterministic (the oracle SQL orders by
 * `dist [DESC], label`).
 *
 * The heap keeps the *worst retained* element at the root so a new
 * candidate only needs one root comparison — O(log k) per improving
 * row, O(1) per non-improving row.
 */
final class TopKHeap(val k: Int, val ascending: Boolean) {
  val dists = new Array[Double](k)
  val labels = new Array[Long](k)
  var size = 0

  /** true if (d1,l1) is WORSE than (d2,l2) under this ordering */
  @inline private def worse(d1: Double, l1: Long, d2: Double, l2: Long): Boolean = {
    if (d1 != d2) { if (ascending) d1 > d2 else d1 < d2 }
    else l1 > l2
  }

  def insert(d: Double, l: Long): Unit = {
    // NaN distances (corrupt vectors) would lodge at the root — every
    // comparison against NaN is false, so nothing could ever evict them
    if (java.lang.Double.isNaN(d)) return
    if (size < k) {
      dists(size) = d; labels(size) = l; size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(dists(0), labels(0), d, l)) {
      dists(0) = d; labels(0) = l
      siftDown(0)
    }
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val parent = (i - 1) >> 1
      if (worse(dists(i), labels(i), dists(parent), labels(parent))) {
        swap(i, parent); i = parent
      } else return
    }
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var biggest = i
      if (l < size && worse(dists(l), labels(l), dists(biggest), labels(biggest))) biggest = l
      if (r < size && worse(dists(r), labels(r), dists(biggest), labels(biggest))) biggest = r
      if (biggest == i) return
      swap(i, biggest); i = biggest
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val d = dists(i); dists(i) = dists(j); dists(j) = d
    val l = labels(i); labels(i) = labels(j); labels(j) = l
  }

  def merge(other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { insert(other.dists(i), other.labels(i)); i += 1 }
    this
  }

  /** (distance, label) pairs sorted best-first */
  def sorted: Array[(Double, Long)] = {
    val out = (0 until size).map(i => (dists(i), labels(i))).toArray
    out.sortWith { case ((d1, l1), (d2, l2)) =>
      if (d1 != d2) { if (ascending) d1 < d2 else d1 > d2 } else l1 < l2
    }
  }
}

/**
 * TypedImperativeAggregate top-k: Spark runs this with map-side partial
 * aggregation, so a brute-force k-NN over N rows shuffles only
 * `numPartitions x numQueries x k` heap entries instead of N x Q
 * distance rows — the property that makes exact flat search viable at
 * 100 TB (each executor scans its partitions once, emits k candidates
 * per query).
 *
 * Output: array<struct<rank int, label bigint, distance double>>,
 * best-first — the Spark-native shape of the reference's
 * `faiss_search` LIST<STRUCT(rank, label, distance)> return value
 * (duckdb-faiss-ext README "faiss_search").
 */
case class TopKByDistance(
    distance: Expression,
    label: Expression,
    k: Int,
    ascending: Boolean,
    padToK: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(distance, label)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByDistance.resultType

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k, ascending)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val d = distance.eval(input)
    val l = label.eval(input)
    if (d != null && l != null) {
      val dv = d match {
        case x: java.lang.Number => x.doubleValue()
        case x: org.apache.spark.sql.types.Decimal => x.toDouble
        case other => throw new IllegalArgumentException(s"non-numeric distance: $other")
      }
      buffer.insert(dv, l.asInstanceOf[Number].longValue())
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = buffer.merge(other)

  override def eval(buffer: TopKHeap): Any = {
    val sorted = buffer.sorted
    val outLen = if (padToK) k else sorted.length
    val rows = new Array[Any](outLen)
    var i = 0
    while (i < sorted.length) {
      rows(i) = new GenericInternalRow(Array[Any](i, sorted(i)._2, sorted(i)._1))
      i += 1
    }
    // FAISS pads short result lists to exactly k with label = -1
    // (duckdb-faiss-ext README "faiss_search")
    val padDist = if (ascending) Double.MaxValue else Double.MinValue
    while (i < outLen) {
      rows(i) = new GenericInternalRow(Array[Any](i, -1L, padDist))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putDouble(buffer.dists(i)); bb.putLong(buffer.labels(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k, ascending)
    var i = 0
    while (i < n) { h.insert(bb.getDouble, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByDistance =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByDistance =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(distance = newChildren(0), label = newChildren(1))

  override def prettyName: String = "vec_topk"
}

object TopKByDistance {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("label", LongType, nullable = false),
      StructField("distance", DoubleType, nullable = false))),
    containsNull = false)
}
