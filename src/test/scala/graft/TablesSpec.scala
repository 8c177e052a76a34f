package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.TimestampType

/** Pins the events-loading contract across every physical layout the
  * testdata generator has shipped (or could plausibly ship next):
  *
  *  - `events_ns.parquet` — parquet TIMESTAMP(NANOS) (the pre-r6 layout;
  *    surfaces as LongType nanos under the `nanosAsLong` conf);
  *  - `events_us.parquet` — parquet `timestamp[us]`, isAdjustedToUTC=false
  *    (the current layout; loads as TimestampNTZType);
  *  - `events_us_utc.parquet` — `timestamp[us]`, isAdjustedToUTC=true
  *    (what Spark itself writes, e.g. [[ScaleUp]]; loads as TimestampType).
  *
  * All three fixtures hold the SAME four logical rows (written by
  * pyarrow from one dict — see src/test/resources/events_layouts/), so the
  * contract is: [[Tables.events]] must return identical rows and a
  * session-zone `TimestampType` `ts` column regardless of layout. The r6
  * regression (testdata regenerated ns→µs, loader still assumed ns, 50
  * components went red) can now only recur by failing this suite first.
  */
class TablesSpec extends SparkSuite {

  private def layoutDir(name: String): String = {
    // Tables.load expects <dir>/events.parquet; materialize each fixture
    // under that name in a temp dir.
    val src = Paths.get(getClass.getResource(s"/events_layouts/$name").toURI)
    val dir = Files.createTempDirectory(s"tables_spec_")
    Files.copy(src, dir.resolve("events.parquet"))
    dir.toString
  }

  private def loadRows(name: String): (Array[Row], org.apache.spark.sql.types.StructType) = {
    val df = Tables.events(spark, layoutDir(name))
    (df.orderBy("event_id").collect(), df.schema)
  }

  private lazy val (nsRows, nsSchema) = loadRows("events_ns.parquet")
  private lazy val (usRows, usSchema) = loadRows("events_us.parquet")
  private lazy val (utcRows, utcSchema) = loadRows("events_us_utc.parquet")

  test("ts is session-zone TimestampType in every layout") {
    for ((schema, name) <- Seq(nsSchema -> "ns", usSchema -> "us", utcSchema -> "us_utc"))
      assert(schema("ts").dataType == TimestampType, s"layout=$name schema=$schema")
  }

  test("nanos-long and microsecond layouts yield identical rows") {
    assert(nsRows.toSeq == usRows.toSeq)
  }

  test("adjusted-to-UTC layout yields identical rows") {
    assert(usRows.toSeq == utcRows.toSeq)
  }

  test("microsecond precision survives the nanos path (no truncation drift)") {
    // Last fixture row is 2025-12-31T23:59:59.999999 — the worst case for a
    // div-1000 rebuild; equality above covers it, this pins the exact value.
    val ts = nsRows.last.getTimestamp(nsRows.last.fieldIndex("ts"))
    assert(ts.toInstant == java.time.Instant.parse("2025-12-31T23:59:59.999999Z"))
  }

  test("real testdata events load and carry rows at sf0.001") {
    val df = Tables.events(spark, sf("sf0.001"))
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() > 0)
  }
}
