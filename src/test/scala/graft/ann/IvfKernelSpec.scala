package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.SparkSpec
import graft.functions.VectorFunctions

class IvfKernelSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  /** The declarative argmin the kernels replaced — rebuilt here as the
    * equivalence oracle: array_min over per-centroid (sqrt-L2, cid)
    * structs, ties to the smaller cid via the struct's second field. */
  private def declarativeArgmin(vec: Column, m: Ivf.Model): Column = {
    val dists = m.centroids.map { case (cid, ctr) =>
      struct(VectorFunctions.l2Distance(vec,
        array(ctr.map(lit).toIndexedSeq: _*)).as("d"), lit(cid).as("cid"))
    }
    array_min(array(dists.toIndexedSeq: _*)).getField("cid")
  }

  private def declarativeNearest(vec: Column, m: Ivf.Model, nprobe: Int): Column = {
    val dists = m.centroids.map { case (cid, ctr) =>
      struct(VectorFunctions.l2Distance(vec,
        array(ctr.map(lit).toIndexedSeq: _*)).as("d"), lit(cid).as("cid"))
    }
    transform(slice(array_sort(array(dists.toIndexedSeq: _*)), 1, nprobe),
      s => s.getField("cid"))
  }

  private def model256: Ivf.Model = {
    // 256 real embeddings as centroids: production-shaped nlist where
    // the old literal forest was the scale ceiling
    val sample = KMeans.sampleVectors(emb, "vec_id", "embedding", 256)
    Ivf.Model(sample.zipWithIndex.map { case (ctr, i) => i -> ctr })
  }

  test("ArgminCell kernel == declarative argmin at nlist=256") {
    val m = model256
    val mismatches = emb
      .withColumn("k", ColumnBridge.column(
        ArgminCell(ColumnBridge.expression(col("embedding")), m.centroids)))
      .withColumn("d", declarativeArgmin(col("embedding"), m))
      .filter(col("k") =!= col("d"))
      .count()
    assert(mismatches === 0L)
  }

  test("NearestCells kernel == declarative sorted-slice at nlist=256, nprobe=7") {
    val m = model256
    val mismatches = emb
      .withColumn("k", ColumnBridge.column(
        NearestCells(ColumnBridge.expression(col("embedding")), m.centroids, 7)))
      .withColumn("d", declarativeNearest(col("embedding"), m, 7))
      .filter(not(col("k") <=> col("d")))
      .count()
    assert(mismatches === 0L)
  }

  test("NearestCells caps at nlist and orders ties by cell id") {
    // two identical centroids: tie must resolve to the smaller id, and
    // nprobe beyond nlist must truncate, matching slice() semantics
    val ctr = Array(0.0, 0.0)
    val m = Ivf.Model(Array(1 -> Array(5.0, 5.0), 0 -> ctr, 2 -> ctr))
    val df = spark.range(1).select(
      array(lit(0.1), lit(0.1)).as("v"))
    val got = df.select(ColumnBridge.column(
        NearestCells(ColumnBridge.expression(col("v")), m.centroids, 99)))
      .first().getSeq[Int](0)
    assert(got === Seq(0, 2, 1))
  }

  test("NaN-bearing vectors still assign to the nearest finite centroid (NaN sorts last)") {
    // centroid 0 at the NaN vector's position would win on a naive
    // strict-< scan that freezes on the first NaN distance
    val m = Ivf.Model(Array(0 -> Array(9.0, 9.0), 1 -> Array(1.0, 1.0)))
    val df = spark.range(1).select(
      array(lit(Double.NaN), lit(1.0)).as("nanv"),
      array(lit(1.0), lit(1.0)).as("ok"))
    // distance to BOTH centroids is NaN (the NaN element poisons the
    // sum), so argmin must fall back to the smallest id — and a vector
    // with no NaN must be unaffected by the NaN branch
    val r = df.select(
      ColumnBridge.column(ArgminCell(ColumnBridge.expression(col("nanv")), m.centroids)),
      ColumnBridge.column(ArgminCell(ColumnBridge.expression(col("ok")), m.centroids)),
      ColumnBridge.column(NearestCells(ColumnBridge.expression(col("ok")), m.centroids, 2)))
      .first()
    assert(r.getInt(0) === 0, "all-NaN distances: first (smallest id) wins, matching struct compare")
    assert(r.getInt(1) === 1)
    assert(r.getSeq[Int](2) === Seq(1, 0))
  }

  test("a centroid at a NaN-free position beats a NaN-distance centroid") {
    // make only ONE distance NaN: centroid 0 contains NaN, centroid 1
    // is finite — the finite centroid must win even though it is
    // scanned second
    val m = Ivf.Model(Array(0 -> Array(Double.NaN, 0.0), 1 -> Array(5.0, 5.0)))
    val df = spark.range(1).select(array(lit(1.0), lit(1.0)).as("v"))
    val got = df.select(
      ColumnBridge.column(ArgminCell(ColumnBridge.expression(col("v")), m.centroids)),
      ColumnBridge.column(NearestCells(ColumnBridge.expression(col("v")), m.centroids, 2)))
      .first()
    assert(got.getInt(0) === 1, "finite distance must beat the NaN incumbent")
    assert(got.getSeq[Int](1) === Seq(1, 0), "NaN-distance cell probes last")
  }

  test("ArgminCell survives null vectors and rejects dimension mismatch") {
    val m = Ivf.Model(Array(0 -> Array(0.0, 0.0)))
    val df = spark.range(1).select(
      lit(null).cast("array<double>").as("v"),
      array(lit(1.0), lit(2.0), lit(3.0)).as("w"))
    val r = df.select(ColumnBridge.column(
      ArgminCell(ColumnBridge.expression(col("v")), m.centroids))).first()
    assert(r.isNullAt(0))
    val err = intercept[Exception] {
      df.select(ColumnBridge.column(
        ArgminCell(ColumnBridge.expression(col("w")), m.centroids))).collect()
    }
    assert(err.getMessage.contains("lengths differ") ||
      Option(err.getCause).exists(_.getMessage.contains("lengths differ")))
  }
}
