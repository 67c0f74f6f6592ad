package graft.ml

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class DsirStoreSpec extends SparkSpec {

  private def df(rows: (Long, String)*): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  private def ratioRows(r: Dsir.Ratio): (Set[(String, Double)], Double) = (
    r.table.collect().map(x => (x.getString(0), x.getDouble(1))).toSet,
    r.oov.head().getDouble(0))

  test("create + appendPool + appendTarget equals a fresh fit on the unions, bit for bit") {
    val dir = Files.createTempDirectory("dsirstore").toString
    val t1 = df((1L, "cat purr"), (2L, "cat naps"))
    val p1 = df((10L, "stock market"), (11L, "bond yield cat"))
    val t2 = df((3L, "whiskers purr purr"))
    val p2 = df((12L, "market curve"), (13L, "   "))
    DsirStore.create(spark, t1, p1, "text", dir)
    DsirStore.appendPool(spark, p2, "text", dir)
    DsirStore.appendTarget(spark, t2, "text", dir)
    val incremental = ratioRows(DsirStore.ratio(spark, dir))
    val full = ratioRows(Dsir.ratioTable(
      t1.unionByName(t2), p1.unionByName(p2), "text"))
    assert(incremental._1 == full._1, "ratio tables differ")
    assert(incremental._2 == full._2, "OOV constants differ")
  }

  test("weights served from the store match the batch ratio") {
    val dir = Files.createTempDirectory("dsirstore2").toString
    val t1 = df((1L, "cat purr cat"))
    val p1 = df((10L, "stock market bond"), (11L, "the cat naps"))
    DsirStore.create(spark, t1, p1, "text", dir)
    DsirStore.appendPool(spark, df((12L, "yield curve")), "text", dir)
    val pool = p1.unionByName(df((12L, "yield curve")))
    val fromStore = Dsir.logWeights(pool, "doc_id", "text", DsirStore.ratio(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val fromBatch = Dsir.logWeights(pool, "doc_id", "text",
      Dsir.ratioTable(t1, pool, "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(fromStore == fromBatch)
    assert(fromStore(11L) > fromStore(10L), "cat evidence must outrank finance")
  }
}
