package graft.functions

import org.apache.spark.sql.functions._

/** Fuzz gate for the WsTokens codegen kernel: the kernel must equal the
  * composed Spark expression it replaced --
  * `filter(split(lower(trim(text)), "\\s+"), t => t <> '')` -- value
  * for value, because every text operator's oracle hash is downstream
  * of tokenization. The reference here IS the old Spark expression
  * (evaluated in-session), not a hand reimplementation, so locale /
  * collation / regex-dialect edges are compared against the authority.
  * Every non-ASCII / control fixture character is an explicit unicode
  * escape (the round-15 lesson: editors silently normalize raw Unicode
  * source literals; this spec is generated pure-ASCII).
  */
class WsTokensSpec extends graft.SparkSpec {

  private def referenceVsKernel(strings: Seq[String]): Unit = {
    import spark.implicits._
    val df = strings.toDF("text")
    val rows = df.select(
        col("text"),
        filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
          .as("ref"),
        WsTokens.of(col("text")).as("got"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"kernel diverges on " +
          Option(r.getString(0)).map(_.map(c => f"<${c.toInt}%04x>").mkString))
    }
  }

  test("adversarial edges: whitespace kinds, controls, unicode, empties") {
    val cases = Seq(
      "", " ", "   ", "\u0009", "\u000a", "\u000d\u000a",
      "\u000b\u000c", "a", " a ", "a b", "  a   b  ",
      "a\u0009b\u000ac\u000dd\u000be\u000cf", "\u0000ab", "ab\u0001",
      "\u0007 bell \u0007", "a\u00a0b", "a\u2009b", "a\u3000b",
      "\u00a0", "\u2028x\u2029y", "\u0130stanbul I\u0131",
      "\u03a3\u03c3\u03c2 \u03a3O\u03a3", "STRA\u00dfE", "\ufb00at",
      "McDONALD's", "\u4e2d\u6587 \u6587\u5b57",
      "caf\u00e9 cafe\u0301", "\ud83d\ude00 \ud83d\udc4d\ud83c\udffd",
      "x\u0300\u0301 y",
      // long runs and single-char tokens
      ("a " * 500).trim, "a" * 4096, (" " * 100) + "x" + (" " * 100))
    referenceVsKernel(cases)
  }

  test("null propagates") {
    import spark.implicits._
    val rows = Seq[Option[String]](None, Some("a b"))
      .toDF("text")
      .select(WsTokens.of(col("text")).as("got"))
      .collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getSeq[String](0) === Seq("a", "b"))
  }

  test("seeded random fuzz across a hostile alphabet") {
    val r = new scala.util.Random(20)
    val alphabet: Array[String] = Array(
      " ", "\u0009", "\u000a", "\u000d", "\u000b", "\u000c", "\u00a0",
      "\u2009", "\u3000", "a", "B", "z", "0", ".", "-", "_", "'",
      "\u00e9", "\u00c9", "\u0130", "\u0131", "\u03a3", "\u03c2",
      "\u00df", "\u4e2d", "\ud83d\ude00", "\u0301", "\u0000", "\u001f")
    val cases = (1 to 400).map { _ =>
      (0 until r.nextInt(40)).map(_ => alphabet(r.nextInt(alphabet.length))).mkString
    }
    referenceVsKernel(cases)
  }
}
