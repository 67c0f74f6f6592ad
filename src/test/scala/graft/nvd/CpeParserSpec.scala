package graft.nvd

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CpeParserSpec extends SparkSpec {

  test("cpe23Uri parses into part/vendor/product/version; escaped colon survives") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      "cpe:2.3:o:bsdi:bsd_os:3.1:*:*:*:*:*:*:*",
      "cpe:2.3:a:acme:name\\:with\\:colons:2.0:*:*:*:*:*:*:*").toDF("cpe")
    val rows = df.select(CpeParser.parsed(col("cpe")).as("p"))
      .select("p.part", "p.vendor", "p.product", "p.version").collect()
    assert(rows(0).toSeq === Seq("o", "bsdi", "bsd_os", "3.1"))
    assert(rows(1).toSeq === Seq("a", "acme", "name:with:colons", "2.0"))
  }

  test("escaped backslash before a separator colon does not eat the colon; short URIs yield nulls") {
    val sp = spark; import sp.implicits._
    // vendor is literally foo\ (escaped as foo\\) — the next colon IS
    // a separator; a naive single-char lookbehind merged the fields
    val df = Seq(
      "cpe:2.3:a:foo\\\\:bar:1.0:*:*:*:*:*:*:*",
      "cpe:/a:short").toDF("cpe")
    val rows = df.select(CpeParser.parsed(col("cpe")).as("p"))
      .select("p.part", "p.vendor", "p.product", "p.version").collect()
    assert(rows(0).toSeq === Seq("a", "foo\\", "bar", "1.0"))
    // malformed/truncated URI: null components, not an ANSI index error
    assert(rows(1).toSeq === Seq("short", null, null, null))
  }

  test("versionKey orders numerically; versionInRange honors bound kinds and open bounds") {
    val sp = spark; import sp.implicits._
    def keyed(vs: String*): Seq[String] = vs.toDF("v")
      .select(CpeParser.versionKey(col("v")).as("k")).collect().map(_.getString(0)).toSeq
    // the two classic failures of naive string compare
    val Seq(k9, k10) = keyed("1.2.9", "1.2.10")
    assert(k9 < k10, "1.2.9 must order below 1.2.10")
    val Seq(kShort, kPadded) = keyed("1.2", "1.2.0")
    assert(kShort === kPadded, "1.2 must equal 1.2.0")

    def inRange(v: String, si: String, se: String, ei: String, ee: String): Boolean =
      Seq((v, si, se, ei, ee)).toDF("v", "si", "se", "ei", "ee")
        .select(CpeParser.versionInRange(col("v"), col("si"), col("se"),
          col("ei"), col("ee")).as("r"))
        .first().getBoolean(0)
    assert(inRange("1.2.10", "1.2.9", null, null, "1.2.11"))   // inside [9, 11)
    assert(!inRange("1.2.11", "1.2.9", null, null, "1.2.11"))  // end exclusive
    assert(inRange("1.2.11", "1.2.9", null, "1.2.11", null))   // end inclusive
    assert(!inRange("1.2.9", null, "1.2.9", null, null))       // start exclusive
    assert(inRange("1.2.9", "1.2.9", null, null, null))        // start inclusive
    assert(inRange("7.7.7", null, null, null, null))           // all bounds open
  }

  test("cve2cpe star populates from the flattened feed and answers the product query") {
    val flat = CveFlatten.flattenFeed(spark,
      Seq(java.nio.file.Paths.get("src/test/resources/nvdfeed/2002.json").toUri.toString))
    val fact = CpeParser.cve2cpe(flat)
    assert(fact.count() === 2) // CVE-2002-0001's two vulnerable CPEs
    assert(CpeParser.vendorDim(fact).collect().map(_.getString(0)).toSet === Set("bsdi", "acme"))
    val hits = CpeParser.cvesForProduct(fact, "bsdi", "bsd_os")
      .collect().map(_.getString(0))
    assert(hits.toSeq === Seq("CVE-2002-0001"))
  }
}
