package graft.exprs

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded k-minimum-values (KMV) state: the k smallest DISTINCT int64
  * hash values under UNSIGNED order. The classic mergeable
  * distinct-cardinality sketch (Bar-Yossef et al. 2002): at any corpus
  * size the aggregation state is O(k) longs, partials combine by
  * set-union-then-truncate, and only k-long arrays ever cross the
  * shuffle — the shape a 100 TB distinct count needs.
  *
  * A red-black tree (TreeSet) keeps insert/evict at O(log k); the
  * unsigned comparator makes the hash domain [0, 2^64) even though
  * values are stored as signed JVM longs.
  */
final class KmvState(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long](
    new java.util.Comparator[java.lang.Long] {
      override def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    })

  def insert(v: Long): Unit = {
    if (set.size < k) { set.add(v); () }
    else if (java.lang.Long.compareUnsigned(v, set.last) < 0) {
      // strictly smaller than the current k-th minimum: swap it in
      if (set.add(v)) { set.pollLast(); () }
    }
  }

  def mergeFrom(other: KmvState): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) insert(it.next())
  }

  /** Ascending (unsigned) snapshot. */
  def sorted: Array[Long] = {
    val out = new Array[Long](set.size)
    var i = 0
    val it = set.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}

/** `kmv_mins(hash, k)` — aggregate returning the ascending (unsigned)
  * array of the k smallest distinct hash values of the group. The input
  * column must already be a well-mixed int64 (e.g. [[ShuffleHash]]'s
  * fmix64 bijection, in which case "distinct hashes" IS "distinct ids"
  * with zero collision risk and the k-th minimum is exactly replayable
  * by an oracle sorting the true distinct set).
  *
  * Downstream math (k-th value → cardinality estimate) stays in the
  * DataFrame layer — see Sketches.kmvDistinct — so this expression is a
  * pure order statistic.
  */
case class KMinHashAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KmvState] with UnaryLike[Expression] {
  require(k > 0 && k <= (1 << 20),
    s"kmv_mins: k must be in [1, 2^20], got $k — state is O(k) per group")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_mins requires a bigint hash input, got ${child.dataType} — " +
          "mix the id through shuffle_hash64 first")

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buffer: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvState, other: KmvState): KmvState = {
    buffer.mergeFrom(other); buffer
  }

  override def eval(buffer: KmvState): Any =
    new GenericArrayData(buffer.sorted)

  override def serialize(buffer: KmvState): Array[Byte] = {
    val vs = buffer.sorted
    val bb = ByteBuffer.allocate(4 + 8 * vs.length)
    bb.putInt(vs.length)
    var i = 0
    while (i < vs.length) { bb.putLong(vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new KmvState(k)
    var i = 0
    // values were serialized ascending and distinct: plain adds suffice
    while (i < n) { st.set.add(bb.getLong); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): KMinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KMinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KMinHashAgg =
    copy(child = c)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_mins"
}
