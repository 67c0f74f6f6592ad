package graft

import org.apache.spark.sql.functions._

/** Ad-hoc stage-cost probe for the events-graph community family
  * (q178/q188/q200/q201/q226): times each pipeline piece in isolation
  * so optimization lands on the measured bottleneck, not the guessed
  * one. Not part of the library surface.
  */
object CommunityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val events = Tables.events(spark, sfDir)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    println(s"events rows: ${events.count()}")
    // warmup
    events.select(col("user_id")).distinct().count()

    val presence = time("presence distinct") {
      events
        .select(floor(unix_timestamp(col("ts")) / 600).as("w"),
          col("user_id").as("actor"))
        .distinct()
        .localCheckpoint()
    }
    println(s"presence rows: ${presence.count()}")

    val pairs = time("copresence pairs (self-join + agg + checkpoint)") {
      graft.operators.CoPresence.pairs(events, "user_id", "ts",
          windowSec = 600, minShared = 3, maxWindowActors = 100)
        .select(col("ua"), col("ub"))
        .localCheckpoint()
    }
    println(s"pair rows: ${pairs.count()}")

    val labels = time("LPA 3 rounds (construction + checkpoint)") {
      graft.operators.LabelPropagation.run(pairs, "ua", "ub", rounds = 3)
        .localCheckpoint()
    }
    println(s"label rows: ${labels.count()}")

    time("LPA 3 rounds end-to-end count, no pre-checkpoint") {
      graft.operators.LabelPropagation.run(pairs, "ua", "ub", rounds = 3).count()
    }

    // --- window statistics: what does the self-join actually expand to?
    val wstats = presence.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("windows"),
        sum(col("n")).as("rows"),
        sum(col("n") * col("n")).as("sum_n2"),
        sum(when(col("n") > 100, 1).otherwise(0)).as("hot"),
        max(col("n")).as("max_n")).collect()(0)
    println(s"PROBE wstats: $wstats")
    val kept = presence // after guard
    time("self-join candidates count (no agg)") {
      val hot = presence.groupBy(col("w")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 100).select(col("w"))
      val k2 = presence.join(broadcast(hot), Seq("w"), "left_anti")
      println("candidates: " + k2.as("a").join(k2.as("b"),
        col("a.w") === col("b.w") && col("a.actor") < col("b.actor")).count())
    }
    time("presence distinct NO checkpoint (noop write)") {
      events
        .select(floor(unix_timestamp(col("ts")) / 600).as("w"),
          col("user_id").as("actor"))
        .distinct()
        .write.format("noop").mode("overwrite").save()
    }
    time("events scan noop") {
      events.write.format("noop").mode("overwrite").save()
    }

    // --- experiments: partition compaction for tiny graph frames ---
    val pairs1 = time("pairs coalesce(1) checkpoint") {
      pairs.coalesce(1).localCheckpoint()
    }
    time("LPA 3 rounds over 1-partition pairs") {
      graft.operators.LabelPropagation.run(pairs1, "ua", "ub", rounds = 3).count()
    }
    val pairs4 = time("pairs repartition(4) checkpoint") {
      pairs.repartition(4).localCheckpoint()
    }
    time("LPA 3 rounds over 4-partition pairs") {
      graft.operators.LabelPropagation.run(pairs4, "ua", "ub", rounds = 3).count()
    }
    val sp2 = spark.newSession()
    sp2.conf.set("spark.sql.shuffle.partitions", 4)
    time("copresence pairs with shuffle.partitions=4") {
      graft.operators.CoPresence.pairs(
          Tables.events(sp2, sfDir), "user_id", "ts",
          windowSec = 600, minShared = 3, maxWindowActors = 100)
        .select(col("ua"), col("ub"))
        .localCheckpoint()
        .count()
    }

    time("q200 full") {
      SparkEntry.queries("q200_community_profile")(spark, sfDir).count()
    }
    time("q201 full") {
      SparkEntry.queries("q201_community_modularity")(spark, sfDir).count()
    }
    time("q188 full") {
      SparkEntry.queries("q188_user_communities")(spark, sfDir).count()
    }
    time("q226 full") {
      SparkEntry.queries("q226_ktruss_events")(spark, sfDir).count()
    }
    time("q178 full") {
      SparkEntry.queries("q178_user_copresence")(spark, sfDir).count()
    }
    spark.stop()
  }
}
