package graft.nvd

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-based checks (SURVEY §5.2) using raw ScalaCheck generators
  * with fixed seeds (the scalatest bridge artifact isn't in the
  * offline cache): F4 invariants over arbitrary configuration trees,
  * J2 string-vs-timestamp compare agreement, CPE escape round-trips.
  */
class CveFlattenPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val cpeGen: Gen[(Boolean, String)] = for {
    vulnerable <- Gen.oneOf(true, false)
    vendor <- Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
    product <- Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
    ver <- Gen.chooseNum(0, 99)
  } yield (vulnerable, s"cpe:2.3:a:$vendor:$product:$ver:*:*:*:*:*:*:*")

  test("F4 invariants: output ⊆ vulnerable inputs, order preserved, non-vulnerable dropped") {
    val trees = samples(Gen.listOfN(3, Gen.listOfN(4, cpeGen)), 15)
    trees.foreach { nodes =>
      val json =
        s"""{"CVE_Items":[{"cve":{"CVE_data_meta":{"ID":"CVE-1"}},
           |"configurations":{"nodes":[${nodes.map(n =>
             s"""{"operator":"OR","cpe_match":[${n.map { case (v, u) =>
               s"""{"vulnerable":$v,"cpe23Uri":"$u"}""" }.mkString(",")}]}""").mkString(",")}]},
           |"publishedDate":"2020-01-01T00:00:00-05:00",
           |"lastModifiedDate":"2020-01-01T00:00:00-05:00"}]}""".stripMargin.replace("\n", "")
      val tmp = java.nio.file.Files.createTempFile("prop", ".json")
      java.nio.file.Files.writeString(tmp, json)
      val out = CveFlatten.flattenFeed(spark, Seq(tmp.toUri.toString))
        .select("vulnerable_cpes").first().getSeq[String](0)
      val expected = nodes.flatten.filter(_._1).map(_._2)
      assert(out === expected)
      java.nio.file.Files.delete(tmp)
    }
  }

  test("J2: lexicographic compare on same-offset ISO strings agrees with timestamp compare") {
    val tsGen = for {
      y <- Gen.chooseNum(2002, 2030)
      mo <- Gen.chooseNum(1, 12); d <- Gen.chooseNum(1, 28)
      h <- Gen.chooseNum(0, 23); mi <- Gen.chooseNum(0, 59); s <- Gen.chooseNum(0, 59)
    } yield f"$y%04d-$mo%02d-$d%02dT$h%02d:$mi%02d:$s%02d-04:00"
    val pairs = samples(Gen.zip(tsGen, tsGen), 300)
    pairs.foreach { case (a, b) =>
      val stringCmp = a > b
      val tsCmp = java.time.OffsetDateTime.parse(a).isAfter(java.time.OffsetDateTime.parse(b))
      assert(stringCmp === tsCmp,
        s"string and timestamp compare must agree for constant-offset ISO strings: $a vs $b")
    }
  }

  test("CPE parser round-trips arbitrary escaped components") {
    val compGen = Gen.listOfN(3, Gen.oneOf(
      Gen.listOfN(5, Gen.alphaNumChar).map(_.mkString),
      Gen.const("a:b"), Gen.const("x\\y"), Gen.const("m:x\\:n")))
    val sp = spark; import sp.implicits._
    samples(compGen, 40).foreach { comps =>
      val escaped = comps.map(_.replace("\\", "\\\\").replace(":", "\\:"))
      val uri = (Seq("cpe", "2.3", "a") ++ escaped ++ Seq("*", "*", "*", "*", "*", "*")).mkString(":")
      val parsed = Seq(uri).toDF("cpe")
        .select(CpeParser.parsed(col("cpe")).as("p"))
        .select("p.vendor", "p.product", "p.version").first()
      assert(parsed.getString(0) === comps(0), s"uri=$uri")
      assert(parsed.getString(1) === comps(1), s"uri=$uri")
      assert(parsed.getString(2) === comps(2), s"uri=$uri")
    }
  }
}
