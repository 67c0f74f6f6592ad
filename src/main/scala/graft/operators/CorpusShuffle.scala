package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic seeded corpus shuffle + shard assignment — the
  * training-data export step: break source ordering (a corpus read in
  * crawl/ingest order is badly auto-correlated for training) with a
  * SEEDED, re-runnable permutation, and split into `nShards` balanced
  * shards whose membership and internal order are pure functions of
  * (id, seed) — re-running the export, on any cluster layout, yields
  * byte-identical shards. No `rand()`: nondeterministic functions make
  * task retries produce different shards mid-write. (Reference scope:
  * nvd2mysqlloader has no corpus/export surface — this is part of the
  * mandated training-data extension set.)
  *
  * Order key = the md5-derived 60-bit integer of `id:seed` (the repo's
  * portable-hash pattern, q85b) — uniform, so shards balance to
  * ±O(sqrt(n/nShards)) and the within-shard order is a uniform random
  * permutation of the shard.
  *
  * Scale: shard assignment is a narrow projection; within-shard
  * position is one window partitioned by shard — a single hash
  * shuffle into nShards groups, no global sort. `writeShards` lays
  * each shard out as its own partition directory with the shard's rows
  * in key order inside the files.
  */
object CorpusShuffle {

  /** 60-bit uniform order key for (id, seed). */
  def orderKey(id: Column, seed: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + seed))), 1, 15), 16, 10)
      .cast("long")

  /** Adds `shard` (0..nShards-1) and `pos` (1-based position inside the
    * shard's shuffled order); both deterministic in (idCol, seed). */
  def assign(
      docs: DataFrame,
      idCol: String,
      nShards: Int,
      seed: String): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val hv = orderKey(col(idCol), seed)
    val w = Window.partitionBy(col("shard")).orderBy(col("__hv"), col(idCol))
    docs
      .withColumn("__hv", hv)
      .withColumn("shard", pmod(col("__hv"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__hv")
  }

  /** Writes the shuffled corpus as `path/shard=K/` parquet, one task
    * per shard (repartition on the shard key), rows inside each shard's
    * files in shuffled order (sortWithinPartitions), so a training
    * reader streaming a shard sequentially sees the seeded permutation
    * without any further sort. */
  def writeShards(
      docs: DataFrame,
      idCol: String,
      nShards: Int,
      seed: String,
      path: String): Unit =
    assign(docs, idCol, nShards, seed)
      // range, not hash: hash-partitioning the shard VALUE collides
      // several shards into one task (pmod(murmur3(k), n)) leaving
      // others idle; a range split over n distinct values gives the
      // intended one-shard-per-task layout
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
