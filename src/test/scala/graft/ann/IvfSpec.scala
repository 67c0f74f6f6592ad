package graft.ann

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("IVF train/index/probe: full-probe equals brute force; partial probe has decent recall") {
    val queries = emb.filter(col("vec_id") < 15)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val model = Ivf.train(emb, "vec_id", "embedding", nlist = 8, iterations = 2)
    assert(model.nlist === 8)
    val indexed = Ivf.index(emb, "embedding", model)
    // every row assigned to a valid cell
    val cells = indexed.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf(model.centroids.map(_._1).toSet))

    val bf = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 3)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // nprobe = nlist => exhaustive => identical to brute force
    val full = Ivf.topK(indexed, queries, "vec_id", "embedding", "qid", "qvec",
        model, k = 3, nprobe = 8)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === bf, "exhaustive probe must equal brute force")

    // partial probe: self-neighbor always found (its own cell is nearest)
    val part = Ivf.topK(indexed, queries, "vec_id", "embedding", "qid", "qvec",
        model, k = 3, nprobe = 3)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 15L).foreach(q => assert(part.contains((q, q))))
    val recall = (bf intersect part).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF nprobe=3/8 recall degenerate: $recall")
  }

  test("IVF index written partitioned by cell prunes partitions at probe time") {
    val model = Ivf.train(emb, "vec_id", "embedding", nlist = 8, iterations = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivfstore").toString
    Ivf.index(emb, "embedding", model).write.mode("overwrite")
      .partitionBy("cell").parquet(dir)

    val stored = spark.read.parquet(dir)
    val someCell = stored.select("cell").first().getInt(0)
    val probe = stored.filter(col("cell") === someCell)
    // the cell predicate must prune whole directories, not filter rows:
    // it appears as a PartitionFilter on the scan, not a PushedFilter
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cell"), scan)
    assert(probe.count() > 0)
    assert(probe.count() < stored.count(), "pruned probe should read a strict subset")
  }
}
