package graft

import org.apache.spark.sql.types.TimestampType

/** Loader contract for the events table across parquet timestamp
  * encodings. The driver's testdata regen has shipped `ts` as both
  * TIMESTAMP(NANOS) and TIMESTAMP(MICROS); `Tables.eventsFrom` must
  * yield identical session-UTC TimestampType instants for either, so
  * the next regen fails loud here instead of in the driver's verify.
  */
class TablesSpec extends SparkSpec {
  private def fixture(name: String): String =
    getClass.getResource(s"/events_fixture/$name.parquet").getPath

  private def instants(name: String): Seq[(Long, java.sql.Timestamp)] = {
    val df = Tables.eventsFrom(spark, fixture(name))
    assert(df.schema("ts").dataType === TimestampType, s"$name dtype")
    df.select("event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq.sortBy(_._1)
  }

  test("micros-NTZ fixture (current regen shape) loads as UTC TimestampType") {
    val rows = instants("events_micros_ntz")
    assert(rows.size === 8)
    // 1700000000000000 us = 2023-11-14T22:13:20Z
    assert(rows.head._2.toInstant.toString === "2023-11-14T22:13:20Z")
  }

  test("nanos fixture (old regen shape) truncates to the same micros instants") {
    val ntz = instants("events_micros_ntz")
    val nanos = instants("events_nanos") // has +789ns residue per row
    assert(nanos === ntz, "nanos->micros truncation must match the micros file")
  }

  test("micros-UTC (isAdjustedToUTC) fixture loads identically") {
    assert(instants("events_micros_utc") === instants("events_micros_ntz"))
  }

  test("live testdata events loads with TimestampType ts and parses") {
    val df = Tables.events(spark, sf001)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() > 0)
  }
}
