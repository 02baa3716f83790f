package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV ("k minimum values" / theta) sketch aggregate: the k smallest
  * DISTINCT values of a 60-bit hash column, as a sorted ascending
  * `array<long>`.
  *
  * This is the bounded-state primitive behind mergeable distinct-count
  * and set-overlap estimation (Beyer et al., "On Synopses for Distinct-
  * Value Estimation Under Multiset Operations", SIGMOD 2007): because
  * hashes are uniform on [0, 2^60), the k-th smallest over a set of n
  * distinct items sits near k/n · 2^60, so n ≈ (k−1)·2^60 / h_k — and two
  * sketches union by merging and re-truncating, which is exactly what
  * [[merge]] does. Unlike HLL registers, the surviving hashes themselves
  * support INTERSECTION and DIFFERENCE estimates, which registers cannot.
  *
  * Scale shape: a `TypedImperativeAggregate` with a ≤ k-entry ordered
  * buffer, so the map-side partial consumes raw rows IN the scan stage
  * and the exchange carries at most k longs per group — the corpus never
  * shuffles, no matter how many rows feed a group (the same contract as
  * the HLL register aggregation in [[graft.ops.Sketches]], with set
  * algebra on top). Duplicate hashes collapse in the buffer (set
  * semantics), so no pre-`distinct` pass — and its shuffle — is needed.
  *
  * Determinism: input hashes come from [[Hashing.h64]] (md5-derived), and
  * "k smallest distinct" is a pure function of the input SET — partition
  * order, merge order, and duplication cannot change the result, so the
  * DuckDB oracle reproduces the sketch row-for-row with a windowed
  * `row_number() ≤ k` over distinct hashes.
  */
case class KMinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 1, s"kminhash: k must be >= 1, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(b: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    // insert-then-trim keeps the k smallest; TreeSet dedups for free
    if (b.size < k || h < b.last()) {
      b.add(h)
      if (b.size > k) b.pollLast()
    }
  }

  override def update(b: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(b, v.asInstanceOf[Long])
    b
  }

  override def merge(b: java.util.TreeSet[java.lang.Long],
                     o: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = o.iterator()
    while (it.hasNext) add(b, it.next())
    b
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 } // TreeSet iterates ascending
    new GenericArrayData(out)
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(b.size * 8)
    val it = b.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val b = createAggregationBuffer()
    val buf = ByteBuffer.wrap(bytes)
    while (buf.hasRemaining) b.add(buf.getLong)
    b
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false // empty input → empty array, never null
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def prettyName: String = "kminhash"

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinHashAgg =
    copy(child = newChild)
}

object KMinHash {
  /** Column API: aggregate the k smallest distinct values of `hash`
    * (a [[Hashing.h64]]-derived long) into a sorted ascending array. */
  def of(hash: Column, k: Int): Column =
    ColumnBridge.wrap(
      KMinHashAgg(ColumnBridge.toExpr(hash), k).toAggregateExpression())
}
