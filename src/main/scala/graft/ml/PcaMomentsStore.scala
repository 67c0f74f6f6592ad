package graft.ml

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted, incrementally-maintainable PCA sufficient statistics —
  * the third leg of the incremental-model family (NB counts, DSIR
  * counts, now second moments): `(n, Σx, Σ upper xxᵀ)` merge by plain
  * addition, so a corpus drop updates the store with ONE treeAggregate
  * over the delta plus an O(d²) driver-side add, and the PCA /
  * Mahalanobis model re-derives from the store without ever
  * re-reading history vectors.
  *
  * The store is a single-row parquet (n, dim, sums[], prods[]) behind
  * the atomic-swap convention. FP note: merged sums differ from a
  * fresh one-pass fit only by addition order (~1e-15 relative);
  * PcaMomentsStoreSpec pins the agreement at 1e-9.
  */
object PcaMomentsStore {

  private def dir(path: String) = s"$path/moments"

  private val schema = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("dim", IntegerType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("prods", ArrayType(DoubleType, containsNull = false), nullable = false)))

  private def write(spark: SparkSession, st: Pca.Stats, path: String,
      overwrite: Boolean): Unit = {
    val row = Row(st.n, st.dim, st.sums.toSeq, st.prods.toSeq)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1), schema)
    if (overwrite) df.write.mode(SaveMode.Overwrite).parquet(dir(path))
    else {
      import graft.operators.SwapDir
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val staging = dir(path) + ".staging"
      df.write.mode(SaveMode.Overwrite).parquet(staging)
      SwapDir.swap(fs, new Path(staging), new Path(dir(path)))
    }
  }

  /** Initialize (overwrite) from a first batch of vectors. */
  def create(spark: SparkSession, batch: DataFrame, vecCol: String,
      dim: Int, path: String): Unit =
    write(spark, Pca.fitStats(batch, vecCol, dim), path, overwrite = true)

  def read(spark: SparkSession, path: String): Pca.Stats = {
    import graft.operators.SwapDir
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(dir(path)))
    val r = spark.read.parquet(dir(path)).head()
    Pca.Stats(r.getAs[Long]("n"),
      r.getAs[scala.collection.Seq[Double]]("sums").toArray,
      r.getAs[scala.collection.Seq[Double]]("prods").toArray,
      r.getAs[Int]("dim"))
  }

  /** Fold a delta batch into the store: one pass over the DELTA, an
    * O(d²) driver add, one tiny atomic write. */
  def append(spark: SparkSession, batch: DataFrame, vecCol: String,
      path: String): Unit = {
    val prev = read(spark, path)
    val delta = Pca.fitStats(batch, vecCol, prev.dim)
    val merged = Pca.Stats(
      prev.n + delta.n,
      prev.sums.zip(delta.sums).map { case (a, b) => a + b },
      prev.prods.zip(delta.prods).map { case (a, b) => a + b },
      prev.dim)
    write(spark, merged, path, overwrite = false)
  }

  /** Derive the serving PCA model from the stored moments. */
  def model(spark: SparkSession, path: String, k: Int): Pca.Model = {
    val st = read(spark, path)
    require(k >= 1 && k <= st.dim, s"k out of range: $k (dim ${st.dim})")
    val (evals, evecs) = Pca.eigSym(st.covMatrix)
    Pca.Model(st.mean, evecs.take(k), evals.take(k))
  }
}
