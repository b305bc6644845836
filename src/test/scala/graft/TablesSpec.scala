package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Pins the `events.ts` encoding normalization (Tables.events): the driver's
  * data generations have shipped `ts` as TIMESTAMP(NANOS) and as
  * TIMESTAMP(MICROS, isAdjustedToUTC=false), and a plain UTC-adjusted
  * TIMESTAMP is the third legal shape. All three must land on identical
  * microsecond instants after load — the committed fixtures (one parquet per
  * encoding, generated with identical logical rows) make the three-branch
  * dispatch a tested contract instead of a trusted one.
  *
  * The nanos fixture stores sub-µs remainders around the epoch (-1500, -999,
  * +1999 ns) so the truncation-TOWARD-ZERO contract of
  * [[Tables.nsToMicrosTrunc]] is pinned against the exact values DuckDB
  * produces for the same file (-1500 ns → -1 µs, -999 ns → 0, +1999 ns → 1).
  */
class TablesSpec extends SparkSpec {

  private def fixtureDir(enc: String): String = {
    val dev = Paths.get(s"src/test/resources/fixtures/ts_encodings/$enc")
    if (Files.exists(dev)) dev.toAbsolutePath.toString
    else getClass.getResource(s"/fixtures/ts_encodings/$enc").getPath
  }

  private def loadedMicros(enc: String): Seq[(Long, Long)] = {
    val df = Tables.events(spark, fixtureDir(enc))
    assert(df.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType,
      s"$enc must normalize to TimestampType")
    df.select(col("event_id"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
  }

  private val expected =
    Seq((1L, -1L), (2L, 0L), (3L, 1L), (4L, 1700000000123456L))

  test("TIMESTAMP(NANOS) parquet loads as µs timestamps, truncated toward zero") {
    assert(loadedMicros("nanos") === expected)
  }

  test("TIMESTAMP(MICROS, NTZ) parquet loads as identical µs timestamps") {
    assert(loadedMicros("ntz") === expected)
  }

  test("UTC-adjusted TIMESTAMP parquet passes through with identical µs") {
    assert(loadedMicros("utc") === expected)
  }

  test("an unrecognized ts encoding fails at load, not downstream") {
    val tmp = Files.createTempDirectory("graft-ts-bad").toString
    import spark.implicits._
    Seq((1L, 1.5)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, tmp))
    assert(e.getMessage.contains("unsupported type"))
  }
}
