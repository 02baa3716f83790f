package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PII scrubbing contract: explicit phone/email/IP forms are masked, and
  * — equally important — clean corpus text is NOT: dates, timestamps, and
  * bare numeric ids must survive (the round-4 review caught a greedy
  * digit-run pattern eating ISO timestamps). */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.scrubPii(col("t"))).head().getString(0)

  test("scrubPii masks emails, IPs, and explicit phone forms") {
    assert(scrub("mail bob.smith+x@corp.example.org now")
      === "mail <EMAIL> now")
    assert(scrub("host 192.168.0.1 down") === "host <IP> down")
    assert(scrub("call +1 (555) 010-4242 today") === "call <PHONE> today")
    assert(scrub("call +44 20 7946 0958 today") === "call <PHONE> today")
    assert(scrub("fax (555) 123-4567.") === "fax <PHONE>.")
  }

  test("scrubPii leaves dates, timestamps, and bare numbers alone") {
    assert(scrub("released on 2021-11-02 03:04:05 UTC")
      === "released on 2021-11-02 03:04:05 UTC")
    assert(scrub("invoice 1234567890 total 12-34") === "invoice 1234567890 total 12-34")
    assert(scrub("range 1990-2020 grew 10 000 units") === "range 1990-2020 grew 10 000 units")
  }
}
