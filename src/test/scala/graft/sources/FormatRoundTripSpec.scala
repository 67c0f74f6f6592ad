package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import graft.SparkSpec
import graft.nvd.CveFlatten

/** Interchange-format fidelity for the flattened NVD frame (the
  * 16-column flat projection — no nested types, so every mainstream
  * format can carry it; the bounds being tested are the FORMATS', not
  * the engine's):
  *
  *   - ORC: full schema + value fidelity (columnar, typed);
  *   - CSV: value fidelity for text with embedded quotes/commas/
  *     newlines REQUIRES quote-escaping on write and multiLine on
  *     read — the spec proves the round trip with a hostile row;
  *   - JSON lines: value fidelity, schema supplied on read (JSON
  *     carries no types; doubles survive, but a schemaless read would
  *     widen ints).
  */
class FormatRoundTripSpec extends SparkSpec {

  private def flatFixture: DataFrame =
    CveFlatten.flattenFeed(spark,
      Seq(Paths.get("src/test/resources/nvdfeed/2002.json").toUri.toString))

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.toSeq === b.columns.toSeq)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("ORC round-trips schema and values exactly") {
    val dir = Files.createTempDirectory("orcrt").toString + "/t"
    val in = flatFixture
    in.write.orc(dir)
    val back = spark.read.orc(dir)
    // file formats surface everything nullable on read; names + types
    // are the fidelity bound that holds
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      in.schema.map(f => (f.name, f.dataType)))
    assertSameRows(in, back)
  }

  test("CSV round-trips hostile text under quoting + multiLine") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("csvrt").toString + "/t"
    val hostile = Seq(
      ("CVE-X-1", "line one\nline two, with comma", 9.8),
      ("CVE-X-2", "quote \" and trailing space ", 0.0),
      ("CVE-X-3", null: String, 5.0))
      .toDF("cve_id", "summary", "score")
    // explicit null token: CSV's default writes null as the empty
    // field, indistinguishable from "" on read
    hostile.write
      .option("header", "true")
      .option("escape", "\"") // RFC-4180 double-quote escaping
      .option("nullValue", "\\N")
      // the WRITER trims by default — fidelity needs it off
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir)
    val back = spark.read
      .schema(hostile.schema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("nullValue", "\\N")
      .csv(dir)
    assertSameRows(hostile, back)
  }

  test("JSON lines round-trip with schema-on-read") {
    val dir = Files.createTempDirectory("jsonrt").toString + "/t"
    val in = flatFixture
    in.write.json(dir)
    val back = spark.read.schema(in.schema).json(dir)
    assertSameRows(in, back)
  }
}
