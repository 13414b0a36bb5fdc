package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-m heap over (dist, id) candidate edges with duplicate-id
  * suppression — the aggregation form of the `shrinkConnections` prune
  * (`src/hnsw.zig:143-170` keeps the m best neighbors per node; here
  * per GROUP, i.e. per (level, src)).
  *
  * The point of being an AGGREGATE rather than a window: Spark runs the
  * partial-merge-final pipeline, so the candidate stream reduces to ≤ m
  * rows per group ON THE MAP SIDE, before any shuffle. The LSH
  * candidate generators ([[graft.operators.Ann.hnswEdgesApprox]]) emit
  * candidate multisets that are orders of magnitude larger than the
  * pruned result (dense buckets ⇒ ~Σ bucket² rows); with the previous
  * distinct + window formulation that whole multiset crossed the wire
  * twice (distinct shuffle + window sort shuffle) — at the sf1 scale
  * point that was a 300M-row exchange and 10 minutes of a single
  * verify query. As an aggregate the multiset stays inside its map
  * stage and the shuffle carries n×m rows.
  *
  * Duplicate suppression makes heap-of-multiset ≡ distinct-then-rank:
  * a candidate pair emitted via several (projection, bucket) keys
  * carries the SAME dist every time (dist is a pure function of the
  * pair), so ignoring an id already in the heap, and rejecting by the
  * usual (dist, id) bound an id that was evicted earlier, yields
  * exactly the top-m of the distinct candidate set — the DuckDB oracle
  * keeps the DISTINCT formulation and the gate hash-proves the
  * equivalence. Ties order by (dist, id), matching the window
  * `ORDER BY dist, dst` it replaces.
  *
  * Buffer is two primitive arrays (no boxing); serialization is a flat
  * byte image. Merge order across partitions is irrelevant to the
  * result (set semantics of a total order), so the aggregate is safe
  * under Spark's nondeterministic partial-merge scheduling. */
case class TopMEdges(
    dst: Expression, dist: Expression, m: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DedupTopM] with BinaryLike[Expression] {

  override def left: Expression = dst
  override def right: Expression = dist
  override def prettyName: String = "top_m_edges"
  override def nullable: Boolean = false
  // analysis-time type guard: update() casts the evaluated inputs
  // unchecked, so a mistyped call site (INT ids, FLOAT dists) must
  // fail HERE, not as a per-row ClassCastException inside the
  // aggregate — the BinaryDoubleArrayFold treatment
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (dst.dataType, dist.dataType) match {
      case (LongType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (BIGINT dst, DOUBLE dist), got " +
            s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dst", LongType, nullable = false),
    StructField("dist", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): DedupTopM = new DedupTopM(m)

  override def update(b: DedupTopM, input: InternalRow): DedupTopM = {
    val iv = dst.eval(input)
    val dv = dist.eval(input)
    if (iv != null && dv != null)
      b.offer(dv.asInstanceOf[Double], iv.asInstanceOf[Long])
    b
  }

  override def merge(b: DedupTopM, other: DedupTopM): DedupTopM = {
    b.absorb(other); b
  }

  override def eval(b: DedupTopM): Any = {
    val (ds, is, n) = b.sortedAsc
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) { rows(i) = InternalRow(is(i), ds(i)); i += 1 }
    new GenericArrayData(rows)
  }

  override def serialize(b: DedupTopM): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): DedupTopM = DedupTopM.fromBytes(m, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopMEdges = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopMEdges = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopMEdges =
    copy(dst = l, dist = r)
}

/** Bounded max-heap keeping the m smallest (dist, id) pairs under the
  * (dist, id) lexicographic total order, ignoring ids already present.
  * The linear membership scan is O(m) per offer with m ≤ ~32 — cheaper
  * than any hash structure at that size. */
final class DedupTopM(m: Int) extends Serializable {
  private val dists = new Array[Double](math.max(m, 1))
  private val ids = new Array[Long](math.max(m, 1))
  private var size = 0

  // Total order via Double.compare, NOT raw > : a NaN distance must
  // order LAST, as Spark SQL's ORDER BY and DuckDB rank it — raw
  // `NaN > x` is false both ways, which made a NaN un-evictable once
  // admitted. (−0.0 < 0.0 under Double.compare is unreachable: squared
  // distances are sums of IEEE squares, never −0.0.)
  @inline private def worse(d1: Double, i1: Long, d2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(d1, d2)
    c > 0 || (c == 0 && i1 > i2)
  }

  private def contains(id: Long): Boolean = {
    var i = 0
    while (i < size) { if (ids(i) == id) return true; i += 1 }
    false
  }

  def offer(d: Double, id: Long): Unit = {
    if (m == 0) return
    if (size < m) {
      if (contains(id)) return
      var i = size
      dists(i) = d; ids(i) = id; size += 1
      while (i > 0 && worse(dists(i), ids(i), dists((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        swap(i, p); i = p
      }
    } else if (worse(dists(0), ids(0), d, id)) {
      // better than the current worst: a duplicate of a RETAINED id is
      // caught here; a duplicate of an EVICTED id never reaches this
      // branch (the evictor was strictly better, so the bound rejects)
      if (contains(id)) return
      dists(0) = d; ids(0) = id
      siftDown(0)
    }
  }

  def absorb(other: DedupTopM): Unit = {
    var i = 0
    while (i < other.size) { offer(other.dists(i), other.ids(i)); i += 1 }
  }

  private def swap(a: Int, b: Int): Unit = {
    val td = dists(a); dists(a) = dists(b); dists(b) = td
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var continue = true
    while (continue) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var w = i
      if (l < size && worse(dists(l), ids(l), dists(w), ids(w))) w = l
      if (r < size && worse(dists(r), ids(r), dists(w), ids(w))) w = r
      if (w != i) { swap(i, w); i = w } else continue = false
    }
  }

  /** (dists, ids, n) ascending by (dist, id), NaN last (the same
    * Double.compare order the heap uses); leaves the heap intact. */
  def sortedAsc: (Array[Double], Array[Long], Int) = {
    val n = size
    val idx = Array.range(0, n).sortWith { (a, b) =>
      val c = java.lang.Double.compare(dists(a), dists(b))
      c < 0 || (c == 0 && ids(a) < ids(b))
    }
    (idx.map(dists), idx.map(ids), n)
  }

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + size * 16)
    bb.putInt(size)
    var i = 0
    while (i < size) { bb.putDouble(dists(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object DedupTopM {
  def fromBytes(m: Int, bytes: Array[Byte]): DedupTopM = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new DedupTopM(m)
    var i = 0
    while (i < n) {
      val d = bb.getDouble; val id = bb.getLong
      h.offer(d, id)
      i += 1
    }
    h
  }
}
