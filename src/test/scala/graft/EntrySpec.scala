package graft

/** The driver's smoke check: SparkEntry.entry must return rows > 0. */
class EntrySpec extends SparkSuite {
  test("entry returns a non-empty flagship result") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }
}
