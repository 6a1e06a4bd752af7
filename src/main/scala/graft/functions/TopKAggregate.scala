package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded min-heap of the k best (score, id) pairs, ordered by
  * (score desc, id asc) — the root is always the WORST kept entry, so an
  * incoming candidate only displaces it when strictly better under the
  * total order. Ties are deterministic by construction: equal scores keep
  * the smaller id.
  */
final class TopKHeap(val k: Int) extends Serializable {
  var size = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  // true when (s1, id1) is WORSE than (s2, id2) under (score desc, id asc)
  @inline private def worse(s1: Double, id1: Long, s2: Double, id2: Long): Boolean =
    s1 < s2 || (s1 == s2 && id1 > id2)

  def insert(score: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id
      size += 1
      var i = size - 1 // sift up: the root holds the WORST entry, so a new
      // entry bubbles up while it is worse than its parent
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      var i = 0 // sift down
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var w = i // find the worst of the triple to keep at the root
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  /** Entries ordered best-first: (score desc, id asc). */
  def sorted: Array[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortBy { case (s, id) => (-s, id) }
}

/** Exact distributed top-k per group as a [[TypedImperativeAggregate]]:
  * each map task folds its candidates into a k-bounded heap, so ONLY k
  * entries per (group, task) ever cross the shuffle — for an all-pairs
  * scoring of |Q| queries against a corpus split into P partitions, the
  * exchange carries at most |Q|·k·P rows instead of |Q|·|C|. Compare the
  * window-rank formulation, which shuffles and sorts the full scored pair
  * set; at 100 TB that difference is the plan.
  *
  * Output: `array<struct<cid: long, cos: double>>` ordered best-first by
  * (score desc, id asc) — deterministic under ties.
  */
final case class TopKByScore(
    left: Expression, // score: double
    right: Expression, // id: long
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def prettyName: String = "top_k_by_score"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      buffer.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { buffer.insert(other.scores(i), other.ids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sorted.map { case (s, id) =>
      new GenericInternalRow(Array[Any](id, s))
    })

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buffer.size)
    bb.putInt(buffer.k).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putDouble(buffer.scores(i)).putLong(buffer.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble(); val id = bb.getLong()
      heap.insert(s, id)
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)
}

object TopKFunctions {
  /** Aggregate column: exact top-k (score desc, id asc) per group. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
