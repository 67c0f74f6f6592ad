package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DataSplitSpec extends SparkSpec {

  test("assign: proportions concentrate, assignment stable under corpus growth and layout") {
    val sp = spark; import sp.implicits._
    val cuts = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val docs = (1L to 10000L).toDF("doc_id")

    val a = DataSplit.assign(docs, "doc_id", cuts)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    // realized proportions within a binomial band
    val n = a.size.toDouble
    cuts.foreach { case (name, f) =>
      val got = a.values.count(_ == name) / n
      assert(math.abs(got - f) < 4 * math.sqrt(f * (1 - f) / n),
        s"$name: got $got, want ~$f")
    }

    // growth stability: the first 10k docs keep their split when the
    // corpus doubles (hash-range assignment never migrates rows)
    val grown = DataSplit.assign((1L to 20000L).toDF("doc_id").repartition(11),
        "doc_id", cuts)
      .filter($"doc_id" <= 10000).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(grown === a, "existing docs must not migrate when the corpus grows")

    // a different salt is a different (still complete) partition
    val b = DataSplit.assign(docs, "doc_id", cuts, salt = "other")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(b !== a)

    // invalid cut sets fail loud
    intercept[IllegalArgumentException](
      DataSplit.assign(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4)))
    intercept[IllegalArgumentException](
      DataSplit.assign(docs, "doc_id", Seq.empty))
    intercept[IllegalArgumentException](
      DataSplit.assign(docs, "doc_id", Seq("a" -> 0.5, "a" -> 0.4, "b" -> 0.1)))

    // null ids fail loud at evaluation (no stable split exists)
    val withNull = Seq(Some(1L), None).toDF("doc_id")
    intercept[Exception] {
      DataSplit.assign(withNull, "doc_id", cuts).collect()
    }
  }

  test("leakageFreeAssign: components share a split; singletons match assign; merges move together") {
    val sp = spark; import sp.implicits._
    val cuts = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val docs = (1L to 2000L).toDF("doc_id")
    // a chain component {1,2,3}, a pair {10,11}, rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")

    val got = DataSplit.leakageFreeAssign(docs, "doc_id", pairs, "a", "b", cuts)
      .select($"doc_id", $"root", $"split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

    // every component member shares the root's split; root = min member
    assert(Seq(1L, 2L, 3L).map(got(_)).toSet.size == 1)
    assert(got(1L)._1 == 1L && got(10L)._1 == 10L && got(11L)._1 == 10L)
    // no near-dup pair straddles splits
    Seq((1L, 2L), (2L, 3L), (10L, 11L)).foreach { case (a, b) =>
      assert(got(a)._2 == got(b)._2, s"pair ($a,$b) must not straddle splits")
    }

    // singletons (and an edge-free corpus) degrade to plain assign
    val plain = DataSplit.assign(docs, "doc_id", cuts)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    got.filterNot { case (id, _) => Seq(1L, 2L, 3L, 10L, 11L).contains(id) }
      .foreach { case (id, (root, split)) =>
        assert(root == id && split == plain(id), s"singleton $id")
      }

    // a new edge merging {1,2,3} with {10,11} re-roots to 1 and moves
    // the merged cluster TOGETHER (the guard's required migration)
    val merged = DataSplit.leakageFreeAssign(docs, "doc_id",
        pairs.union(Seq((3L, 10L)).toDF("a", "b")), "a", "b", cuts)
      .select($"doc_id", $"root", $"split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val five = Seq(1L, 2L, 3L, 10L, 11L).map(merged(_))
    assert(five.toSet.size == 1 && five.head._1 == 1L,
      "merged cluster shares one root and one split")
  }
}
