package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** As-of join semantics on hand-built frames: latest-at-or-before match,
  * boundary equality, no-match null, per-key isolation. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asof picks the latest right row at or before each left time") {
    val quotes = Seq(
      (1L, ts(0), 100.0), (1L, ts(10), 110.0), (1L, ts(20), 120.0),
      (2L, ts(5), 50.0)
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts(5), "a"),   // after 10:00 quote -> 100.0
      (1L, ts(10), "b"),  // boundary: exactly at 10:10 -> 110.0 (inclusive)
      (1L, ts(25), "c"),  // -> 120.0
      (2L, ts(4), "d"),   // before any key-2 quote -> null
      (3L, ts(9), "e")    // key with no quotes -> null
    ).toDF("key", "tts", "tag")

    val out = AsofJoin.asof(trades, quotes, "key", "tts", "qts", "price")
      .collect().map(r => r.getAs[String]("tag") ->
        (if (r.isNullAt(r.fieldIndex("asof_price"))) None else Some(r.getAs[Double]("asof_price"))))
      .toMap
    assert(out("a") === Some(100.0))
    assert(out("b") === Some(110.0))
    assert(out("c") === Some(120.0))
    assert(out("d") === None)
    assert(out("e") === None)
  }

  test("a newer right row with a NULL payload wins over an older value") {
    // last(ignoreNulls) on a bare column would carry the stale "x";
    // the struct-wrapped payload distinguishes "no right row" from
    // "right row whose payload is null"
    val right = Seq(
      (1L, ts(1), Some("x")),
      (1L, ts(2), None: Option[String])
    ).toDF("key", "rts", "payload")
    val left = Seq((1L, ts(3), "probe")).toDF("key", "lts", "tag")
    val out = AsofJoin.asof(left, right, "key", "lts", "rts", "payload").head()
    assert(out.isNullAt(out.fieldIndex("asof_payload")),
      s"the as-of match at ts(2) has a null payload; got $out")
  }

  test("forward picks the earliest right row at or after; nearest picks the closer side") {
    val quotes = Seq(
      (1L, ts(0), 100.0), (1L, ts(10), 110.0), (1L, ts(30), 130.0)
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts(2), "a"),   // back 100 (d=2), fwd 110 (d=8)  → nearest 100
      (1L, ts(9), "b"),   // back 100 (d=9), fwd 110 (d=1)  → nearest 110
      (1L, ts(10), "c"),  // boundary both directions → 110 everywhere
      (1L, ts(20), "d"),  // back 110 (d=10), fwd 130 (d=10) → TIE → backward 110
      (1L, ts(40), "e")   // fwd none → nearest falls back to 130
    ).toDF("key", "tts", "tag")
    def run(dir: String): Map[String, Option[Double]] =
      AsofJoin.asof(trades, quotes, "key", "tts", "qts", "price", direction = dir)
        .collect().map(r => r.getAs[String]("tag") ->
          (if (r.isNullAt(r.fieldIndex("asof_price"))) None
           else Some(r.getAs[Double]("asof_price")))).toMap
    val fwd = run("forward")
    assert(fwd("a") === Some(110.0) && fwd("b") === Some(110.0))
    assert(fwd("c") === Some(110.0), "forward boundary is inclusive")
    assert(fwd("d") === Some(130.0))
    assert(fwd("e") === None, "no later right row → null")
    val near = run("nearest")
    assert(near("a") === Some(100.0) && near("b") === Some(110.0))
    assert(near("c") === Some(110.0))
    assert(near("d") === Some(110.0), "equal distances break backward")
    assert(near("e") === Some(130.0))
  }

  test("nearest works on DATE time columns and refuses mismatched time types") {
    val d = java.sql.Date.valueOf(_: String)
    val right = Seq((1L, d("2024-01-01"), 10.0), (1L, d("2024-01-11"), 20.0))
      .toDF("key", "rts", "v")
    val left = Seq((1L, d("2024-01-04"), "a"), (1L, d("2024-01-08"), "b"))
      .toDF("key", "lts", "tag")
    val out = AsofJoin.asof(left, right, "key", "lts", "rts", "v", direction = "nearest")
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[Double]("asof_v")).toMap
    assert(out("a") === 10.0 && out("b") === 20.0)
    val tsLeft = Seq((1L, ts(1), "x")).toDF("key", "lts", "tag")
    assertThrows[IllegalArgumentException](
      AsofJoin.asof(tsLeft, right, "key", "lts", "rts", "v", direction = "nearest"))
  }

  test("left columns pass through unchanged") {
    val right = Seq((1L, ts(0), 1.0)).toDF("key", "rts", "v")
    val left = Seq((1L, ts(1), "x", 42)).toDF("key", "lts", "name", "extra")
    val out = AsofJoin.asof(left, right, "key", "lts", "rts", "v").head()
    assert(out.getAs[String]("name") === "x")
    assert(out.getAs[Int]("extra") === 42)
    assert(out.getAs[Double]("asof_v") === 1.0)
  }
}
