package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the custom kernels: needs its own
  * session (extensions bind at session build). */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("vec_dot / vec_l2sq / simhash64 / minhash_signature are callable from SQL") {
    val sp = spark; import sp.implicits._
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f), Array("a", "b", "c")))
      .toDF("a", "b", "toks").createOrReplaceTempView("v")
    val r = spark.sql(
      """SELECT vec_dot(a, b) AS d, vec_l2sq(a, b) AS l2,
        |  simhash64(toks) AS sh,
        |  size(minhash_signature(transform(toks, t -> xxhash64(t)), 16, 42)) AS mh_k
        |FROM v""".stripMargin).first()
    assert(r.getAs[Double]("d") === 11.0)
    assert(r.getAs[Double]("l2") === 8.0)
    assert(r.getAs[Int]("mh_k") === 16)
    // simhash value matches the DSL route
    val dsl = Seq(Tuple1(Array("a", "b", "c"))).toDF("toks")
      .select(graft.dedup.SimHash.simhash(org.apache.spark.sql.functions.col("toks")))
      .first().getLong(0)
    assert(r.getAs[Long]("sh") === dsl)
  }

  test("cvss3_* and cpe_* column-composition functions are callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  cvss3_base_score('CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H') AS base,
        |  cvss3_temporal_score('CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H/E:F/RL:O/RC:C') AS temp,
        |  cvss3_severity(9.8) AS sev,
        |  cpe_version_in_range('1.2.10', '1.2.9', NULL, NULL, '1.2.11') AS in_range,
        |  cpe_parsed('cpe:2.3:a:foo\\:bar:baz:1.0:*:*:*:*:*:*:*') AS p
        |""".stripMargin).first()
    assert(r.getAs[Double]("base") === 9.8)
    assert(r.getAs[Double]("temp") === 9.1)
    assert(r.getAs[String]("sev") === "CRITICAL")
    val v2 = spark.sql(
      "SELECT cvss2_base_score('AV:N/AC:L/Au:N/C:P/I:P/A:P') AS s, " +
      "cvss2_severity(cvss2_base_score('AV:N/AC:L/Au:N/C:P/I:P/A:P')) AS sev").first()
    assert(v2.getAs[Double]("s") === 7.5 && v2.getAs[String]("sev") === "HIGH")
    assert(r.getAs[Boolean]("in_range"))
    val p = r.getAs[org.apache.spark.sql.Row]("p")
    assert(p.getAs[String]("vendor") === "foo:bar")
    assert(p.getAs[String]("product") === "baz")
  }

  test("text-pipeline functions are callable from SQL and match the Scala API") {
    import graft.functions.{TextFunctions => TF}
    val sql = spark.sql(
      """SELECT token_count('  a b  c ') AS tc,
        |  bpe_token_count('don''t stop-me now2') AS bc,
        |  lang_id(' the cat and the dog of the house ') AS lid,
        |  quality_score('A plain sentence, with words of usual shape.') AS qs,
        |  doc_fingerprint('b a a c') AS fp,
        |  size(word_shingles('a b c d', 2)) AS sh
        |""".stripMargin).first()
    assert(sql.getAs[Int]("tc") === 3)
    assert(sql.getAs[String]("lid") === "en")
    assert(sql.getAs[String]("fp") ===
      spark.range(1).select(TF.fingerprint(org.apache.spark.sql.functions.lit("a c b a")))
        .first().getString(0), "order-insensitive word-set identity")
    assert(sql.getAs[Int]("sh") === 3)
    val dsl = spark.range(1)
      .select(TF.bpeIshTokenCount(org.apache.spark.sql.functions.lit("don't stop-me now2")),
        TF.qualityScore(org.apache.spark.sql.functions.lit("A plain sentence, with words of usual shape.")))
      .first()
    assert(sql.getAs[Int]("bc") === dsl.getInt(0))
    assert(sql.getAs[Double]("qs") === dsl.getDouble(1))
  }
}
