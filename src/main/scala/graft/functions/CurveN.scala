package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.array
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** N-dimensional space-filling-curve keys — the clustering expressions
  * behind the N-column forms of
  * [[graft.delta.DeltaTable.optimizeZOrder]]/`optimizeHilbert` (real
  * OPTIMIZE ZORDER takes any number of columns; 3–4-column layouts are
  * routine). Both take ONE array child (`array(c1, ..., cn)`) so the
  * n-ary shape rides the standard unary codegen path; any null
  * coordinate yields a null key (ordered last by the range partitioner,
  * like any null sort key).
  *
  * Bit budget: [[ZValueN.bitsFor]] gives each of n dimensions
  * ⌊63/n⌋ bits so the interleave never reaches the sign bit (n=3 → 21
  * bits, n=4 → 15). [[HilbertValueN.bitsFor]] additionally caps at the
  * 2-D expression's documented 16-bit window. Same contract as the 2-D
  * forms: inputs must already be non-negative and inside the window —
  * rank or bucket first; masking (not hashing) preserves the locality
  * that is the whole point.
  */
case class ZValueN(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "zvalue_n"

  override protected def nullSafeEval(xs: Any): Any =
    ZValueN.interleave(xs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("zres")
    nullSafeCodeGen(ctx, ev, xs => s"""
      Object $res = graft.functions.ZValueN.interleave($xs);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Long) $res).longValue(); }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ZValueN =
    copy(child = newChild)
}

object ZValueN {

  /** Bits per dimension: the n·b interleave stays below the sign bit. */
  def bitsFor(n: Int): Int = 63 / n

  /** MSB-first round-robin Morton interleave of the low [[bitsFor]] bits
    * of each coordinate; earlier array positions are more significant
    * within each bit round. Null coordinate → null key. */
  def interleave(xs: ArrayData): Any = {
    val n = xs.numElements()
    val b = bitsFor(n)
    var d = 0L
    var k = b - 1
    while (k >= 0) {
      var i = 0
      while (i < n) {
        if (xs.isNullAt(i)) return null
        d = (d << 1) | ((xs.getLong(i) >>> k) & 1L)
        i += 1
      }
      k -= 1
    }
    d
  }

  /** Column API: N-dimensional z-value of non-negative longs inside the
    * ⌊63/n⌋-bit window. */
  def of(cols: Seq[Column]): Column = {
    require(cols.size >= 2, "zvalue_n needs at least two columns")
    ColumnBridge.wrap(ZValueN(ColumnBridge.toExpr(
      array(cols.map(_.cast("long")): _*))))
  }

  /** DuckDB twin of [[of]]: the n·b-term bit-gather OR-sum. Bit
    * positions top out at n·b − 1 ≤ 62, so unlike [[ZValue.sql]] no
    * sign-bit special case is needed. */
  def sql(cols: Seq[String]): String = {
    val n = cols.size
    val b = bitsFor(n)
    val terms = for {
      k <- 0 until b
      i <- 0 until n
    } yield s"((((${cols(i)}) >> $k) & 1) << ${k * n + (n - 1 - i)})"
    terms.mkString("(", " | ", ")")
  }
}

case class HilbertValueN(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hilbert_value_n"

  override protected def nullSafeEval(xs: Any): Any =
    HilbertValueN.index(xs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("hres")
    nullSafeCodeGen(ctx, ev, xs => s"""
      Object $res = graft.functions.HilbertValueN.index($xs);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Long) $res).longValue(); }""")
  }

  override protected def withNewChildInternal(newChild: Expression): HilbertValueN =
    copy(child = newChild)
}

object HilbertValueN {

  /** Bits per dimension: the 2-D expression's 16-bit window, shrunk when
    * n·16 would cross the sign bit (n=4 → 15 bits, n=5 → 12, …). */
  def bitsFor(n: Int): Int = math.min(16, 63 / n)

  /** N-dimensional Hilbert index via Skilling's transpose algorithm
    * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004):
    * inverse-undo the per-bit rotations top bit down, Gray-encode across
    * dimensions, then read the index out of the transposed bits
    * MSB-first round-robin. Unit-step continuity and bijectivity over
    * the full (2^b)^n grid are pinned exhaustively in CurveNSpec. Null
    * coordinate → null key. */
  def index(xs: ArrayData): Any = {
    val n = xs.numElements()
    val b = bitsFor(n)
    val mask = (1L << b) - 1
    val x = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      x(i) = xs.getLong(i) & mask
      i += 1
    }
    // inverse undo: top bit down, reflect/exchange into each quadrant
    var q = 1L << (b - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (b - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transposed bits -> index, MSB-first round-robin
    var d = 0L
    var k = b - 1
    while (k >= 0) {
      i = 0
      while (i < n) { d = (d << 1) | ((x(i) >>> k) & 1L); i += 1 }
      k -= 1
    }
    d
  }

  /** Column API: N-dimensional Hilbert index of non-negative longs inside
    * the [[bitsFor]]-bit window. */
  def of(cols: Seq[Column]): Column = {
    require(cols.size >= 2, "hilbert_value_n needs at least two columns")
    ColumnBridge.wrap(HilbertValueN(ColumnBridge.toExpr(
      array(cols.map(_.cast("long")): _*))))
  }
}
