package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Tie-aware top-k collection buffer: the kept rows plus the prune
  * trigger (re-sorting on every insert would be O(n² log n); the
  * threshold doubles past the kept set so pruning amortizes to
  * O(n log n) worst-case even when ties keep everything), plus the
  * current rank-k boundary key (`null` until a prune actually cut):
  * once the buffer provably holds ranks 1..k in full, any arriving row
  * whose key prefix sorts strictly below the boundary can never reach
  * rank ≤ k and is rejected with ONE prefix compare — no struct copy,
  * no append, no part in any later sort.
  */
final class RankTopKBuffer(
    val rows: ArrayBuffer[InternalRow],
    var threshold: Int,
    var boundary: InternalRow = null)

/** Bounded-heap aggregate for `rank() <= k` filters — the ties-kept twin
  * of Spark's `CollectTopK` used by [[BoundedRankRewrite]]'s row_number
  * path. Keeps every input struct whose RANK under the keep-largest
  * interpreted ordering of its first [[prefixLen]] fields (the encoded
  * ORDER BY keys) is ≤ k: a row survives iff fewer than k rows have a
  * strictly greater key prefix, so whole tie-groups live or die together
  * — exactly `rank()`'s contract, where the k-th place can be shared.
  *
  * State per (group, task) is k plus the boundary tie-group — the same
  * row set the query's OUTPUT carries, so memory is bounded by the
  * answer, not the corpus (the window plan it replaces buffers and fully
  * sorts the whole partition instead). Partial (map-side) aggregation:
  * map tasks pre-prune before the exchange, merge re-prunes.
  *
  * `eval` emits `array<struct<r int, v struct<...>>>` sorted largest-first
  * with `r` the rank (tie-groups share it) — the rewrite explodes the
  * array and projects `r` straight into the window's rank attribute.
  */
case class CollectTopKRank(
    child: Expression,
    k: Int,
    prefixLen: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RankTopKBuffer] with UnaryLike[Expression] {

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  val entryType: StructType = StructType(Seq(
    StructField("r", IntegerType, nullable = false),
    StructField("v", child.dataType, nullable = false)))

  override def dataType: DataType = ArrayType(entryType, containsNull = false)
  override def nullable: Boolean  = false

  /** Ascending interpreted ordering over the leading ORDER BY key fields
    * ([[BoundedRankRewrite.encodeKey]] guarantees they are orderable).
    */
  private lazy val prefixOrd = new InterpretedOrdering(
    (0 until prefixLen).map(i =>
      SortOrder(BoundReference(i, structType(i).dataType, structType(i).nullable), Ascending)))

  /** Full-struct ordering — key prefix first, then the row payload, so
    * eval's output order is deterministic inside tie-groups.
    */
  private lazy val fullOrd = new InterpretedOrdering(
    structType.fields.zipWithIndex.map { case (f, i) =>
      SortOrder(BoundReference(i, f.dataType, f.nullable), Ascending)
    }.toSeq)

  override def createAggregationBuffer(): RankTopKBuffer =
    new RankTopKBuffer(ArrayBuffer.empty, math.max(64, 2 * k))

  override def update(buf: RankTopKBuffer, input: InternalRow): RankTopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // Boundary fast path: with ranks 1..k provably complete in `rows`,
      // a key prefix strictly below the rank-k boundary can only rank
      // > k — reject before the copy/append (ties with the boundary must
      // stay: rank k can be shared). This is what keeps the heap cheap on
      // heavy-tie domains, where the kept set is large and the naive
      // append-then-prune path re-sorts it over and over.
      if (buf.boundary == null || prefixOrd.compare(row, buf.boundary) >= 0) {
        buf.rows += row.copy()
        if (buf.rows.length >= buf.threshold) prune(buf)
      }
    }
    buf
  }

  override def merge(buf: RankTopKBuffer, other: RankTopKBuffer): RankTopKBuffer = {
    buf.rows ++= other.rows
    prune(buf)
    buf
  }

  /** Sort descending and cut at the first row whose rank exceeds k —
    * the boundary tie-group stays whole. No-op below k rows (every rank
    * is ≤ k then, ties or not).
    */
  private def prune(buf: RankTopKBuffer): Unit = {
    if (buf.rows.length > k) {
      val sorted = buf.rows.sortWith((a, b) => fullOrd.compare(a, b) > 0)
      val out    = ArrayBuffer.empty[InternalRow]
      var i      = 0
      var rank   = 1
      var go     = true
      while (go && i < sorted.length) {
        if (i > 0 && prefixOrd.compare(sorted(i), sorted(i - 1)) != 0) rank = i + 1
        if (rank > k) go = false
        else { out += sorted(i); i += 1 }
      }
      buf.rows.clear()
      buf.rows ++= out
      // A cut happened (`!go`) iff some row ranked > k — only then do the
      // kept rows provably span ranks 1..k, making the smallest kept
      // prefix (the last row of the descending sort) the rank-k boundary.
      buf.boundary = if (!go) out.last else null
    }
    buf.threshold = math.max(64, math.max(2 * k, 2 * buf.rows.length))
  }

  override def eval(buf: RankTopKBuffer): Any = {
    prune(buf)
    val sorted = buf.rows.sortWith((a, b) => fullOrd.compare(a, b) > 0)
    val out    = new Array[Any](sorted.length)
    var i      = 0
    var rank   = 1
    while (i < sorted.length) {
      if (i > 0 && prefixOrd.compare(sorted(i), sorted(i - 1)) != 0) rank = i + 1
      out(i) = InternalRow(rank, sorted(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  // the Collect-family serialization idiom: each kept struct as one
  // UnsafeRow wrapped in a single-field row. The projection is hoisted to
  // a lazy val on the aggregate instance (as Spark's Collect aggregates
  // do): serialize() runs once per GROUP at partial-agg output, and
  // creating the projection there put a codegen-cache lookup +
  // instantiation on the hot shuffle-write path.
  @transient private lazy val serializeProjection: UnsafeProjection =
    UnsafeProjection.create(Array[DataType](structType))

  override def serialize(buf: RankTopKBuffer): Array[Byte] = {
    val bos  = new ByteArrayOutputStream()
    val dos  = new DataOutputStream(bos)
    val proj = serializeProjection
    dos.writeInt(buf.rows.length)
    buf.rows.foreach { r =>
      val bytes = proj(InternalRow(r)).getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): RankTopKBuffer = {
    val dis = new DataInputStream(new ByteArrayInputStream(bytes))
    val n   = dis.readInt()
    val buf = createAggregationBuffer()
    var i   = 0
    while (i < n) {
      val len = dis.readInt()
      val arr = new Array[Byte](len)
      dis.readFully(arr)
      val row = new UnsafeRow(1)
      row.pointTo(arr, len)
      buf.rows += row.getStruct(0, structType.length).copy()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectTopKRank =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectTopKRank =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectTopKRank =
    copy(child = newChild)
  override def prettyName: String = "collect_top_k_rank"
}
