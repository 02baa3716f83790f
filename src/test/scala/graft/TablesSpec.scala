package graft

/** Loader contracts: timestamp canonicalization is UTC-session-only. */
class TablesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("Tables.load canonicalizes NTZ timestamps to TimestampType under UTC") {
    val df = Tables.orders(spark, sf)
    assert(df.schema("o_orderdate").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("Tables.load refuses NTZ canonicalization in a non-UTC session") {
    // the NTZ→LTZ cast reinterprets wall-clock values in the session
    // zone — anywhere but UTC that silently shifts every instant, so the
    // loader must fail loudly instead. newSession() isolates the zone
    // override from the shared test session.
    val shifted = spark.newSession()
    shifted.conf.set("spark.sql.session.timeZone", "America/New_York")
    val ex = intercept[IllegalArgumentException] {
      Tables.orders(shifted, sf)
    }
    assert(ex.getMessage.contains("UTC"), s"must name the contract: ${ex.getMessage}")
  }
}
