package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ann.{Ann, GraphAnn}

/** Streaming graph-ANN growth: a 3-batch file stream folds into the
  * persisted navigable graph; every streamed id becomes reachable,
  * recall holds on the grown corpus, redelivery no-ops, and the
  * vectors-landed crash window heals mid-stream. */
class StreamingVectorIngestSpec extends SparkSpec {

  private def emb = graft.Tables
    .load(spark, "/root/testdata/sf0.01", "embeddings")
  private def queries = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("file-stream growth: reachable, recall floor, restart no-op, crash heal") {
    val dir = Files.createTempDirectory("vecingest").toString
    val store = s"$dir/gann"
    GraphAnn.create(emb.filter(col("vec_id") % 4 =!= 0),
      "vec_id", "embedding", spark, store, k = 10)

    // 3 delta batches (mod-4 slice split by mod-12), one with a
    // SIMULATED crash window: its vectors land before the stream runs
    val slices = Seq(0, 4, 8).map(m =>
      emb.filter(col("vec_id") % 12 === m)
        .select(col("vec_id"), col("embedding")))
    slices.zipWithIndex.foreach { case (s, i) =>
      s.write.parquet(s"$dir/in/b$i")
    }
    slices(1).select(col("vec_id").cast("long").as("id"),
        col("embedding").as("v"))
      .withColumn("n", graft.functions.VectorFunctions.l2Norm(col("v")))
      .repartition(1).sortWithinPartitions(col("id"))
      .write.mode("append").parquet(s"$store/vectors")

    StreamingVectorIngest.stream(spark, s"$dir/in/*", s"$dir/ckpt",
      store, "vec_id", "embedding").awaitTermination()

    val h = GraphAnn.open(spark, store)
    // every streamed id reachable: self top-1
    val newQs = emb.filter(col("vec_id") % 4 === 0 && col("vec_id") < 200)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val self = h.topK(newQs, "qid", "qvec", k = 1, beam = 16, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(self.nonEmpty && self.forall { case (q, n) => q == n },
      s"streamed ids must be reachable: ${self.filterNot(p => p._1 == p._2).toSeq}")

    // grown-corpus recall
    val got = h.topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Ann.bruteForceTopK(emb, queries,
        "vec_id", "embedding", "qid", "qvec", 5)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & want).size.toDouble / want.size
    info(s"post-stream recall@5: $recall")
    assert(recall >= 0.9)

    // restart on the same checkpoint: nothing new, no mutation
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mtime = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(store, "_graft_meta")).getModificationTime
    val m0 = mtime
    StreamingVectorIngest.stream(spark, s"$dir/in/*", s"$dir/ckpt",
      store, "vec_id", "embedding").awaitTermination()
    assert(mtime == m0, "a drained restart must not mutate the store")
    assert(asSet(h.topK(queries, "qid", "qvec", k = 5, beam = 16,
      maxHops = 10)) == asSet(GraphAnn.open(spark, store)
      .topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10)))

    // no duplicate vector rows despite the pre-landed crash batch
    val vecs = spark.read.schema("id BIGINT, v ARRAY<FLOAT>, n DOUBLE")
      .parquet(s"$store/vectors")
    assert(vecs.groupBy(col("id")).count()
      .filter(col("count") > 1).count() == 0L)
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
}
