package graft.operators

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

class CoPresenceSpec extends SparkSpec {

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def events(rows: (Long, Int)*) = {
    val sp = spark; import sp.implicits._
    rows.map { case (u, m) => (u, ts(m)) }.toDF("user_id", "ts")
  }

  test("shared windows counted once per window regardless of event multiplicity") {
    // users 1,2 share windows [10:00,10:10) and [10:10,10:20); user 2
    // emits THREE events in the first window — still one presence
    val ev = events(
      (1L, 0), (2L, 1), (2L, 2), (2L, 3),
      (1L, 11), (2L, 12),
      (3L, 31)) // alone
    val out = CoPresence.pairs(ev, "user_id", "ts", windowSec = 600)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 2L) -> 2L))
  }

  test("minShared filters weak ties; pair order is canonical ua < ub") {
    val ev = events((5L, 0), (4L, 1), (4L, 11), (5L, 12), (4L, 21), (6L, 22))
    val all = CoPresence.pairs(ev, "user_id", "ts", windowSec = 600)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(all((4L, 5L)) == 2L && all((4L, 6L)) == 1L)
    assert(all.keys.forall { case (a, b) => a < b })
    val strong = CoPresence.pairs(ev, "user_id", "ts", windowSec = 600, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong == Set((4L, 5L)))
  }

  test("hot-window guard drops flash windows from pairing") {
    // window 0: 5 users (flash); window 1: users 1,2 only
    val ev = events((1L, 0), (2L, 0), (3L, 1), (4L, 2), (5L, 3),
      (1L, 11), (2L, 12))
    val guarded = CoPresence.pairs(ev, "user_id", "ts",
      windowSec = 600, maxWindowActors = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the flash window contributes nothing; only the 2-user window pairs
    assert(guarded == Map((1L, 2L) -> 1L))
  }

  test("driver route equals the distributed self-join route on the harness events") {
    val ev = graft.Tables.events(spark, sf001)
    def run(): Set[(Long, Long, Long)] =
      CoPresence.pairs(ev, "user_id", "ts",
          windowSec = 600, minShared = 3, maxWindowActors = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaDriver = run()
    spark.conf.set(CoPresence.DriverMaxCandidatesKey, "0")
    val viaCluster = try run()
    finally spark.conf.unset(CoPresence.DriverMaxCandidatesKey)
    assert(viaDriver.nonEmpty && viaDriver == viaCluster)
  }

  test("graph-family composition: co-presence edges feed LPA directly") {
    val ev = events(
      (1L, 0), (2L, 0), (1L, 11), (2L, 11), // tight pair
      (8L, 31), (9L, 31), (8L, 41), (9L, 41))
    val edges = CoPresence.pairs(ev, "user_id", "ts", windowSec = 600, minShared = 2)
    val lpa = LabelPropagation.run(edges, "ua", "ub", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa(1L) == lpa(2L) && lpa(8L) == lpa(9L) && lpa(1L) != lpa(8L))
  }
}
