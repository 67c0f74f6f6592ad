package graft.ml

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintainable DSIR ratio store — the same
  * monoid trick as [[NbModelStore]], applied to the importance-ratio
  * model: what the store keeps is the TOKEN COUNT tables of the target
  * and pool corpora (`(token, n)` each — counts merge by addition);
  * the smoothed log-ratio table is derived on read via the exact
  * expression tree [[Dsir.ratioTable]] uses, so a store built by
  * appends yields weights identical to refitting on the concatenated
  * corpora.
  *
  * Why it matters at 100 TB: the pool side of DSIR is the full raw
  * corpus. Refitting on every corpus drop re-tokenizes everything;
  * appending folds only the delta (one explode + groupBy of the new
  * documents + a vocab-sized merge). Target refreshes (rare, small)
  * take the same path on the other table.
  */
object DsirStore {

  private def targetDir(path: String) = s"$path/target"
  private def poolDir(path: String) = s"$path/pool"

  /** Initialize (overwrite) both count tables. */
  def create(spark: SparkSession, target: DataFrame, pool: DataFrame,
      textCol: String, path: String): Unit = {
    Dsir.corpusCounts(target, textCol, "n")
      .write.mode(SaveMode.Overwrite).parquet(targetDir(path))
    Dsir.corpusCounts(pool, textCol, "n")
      .write.mode(SaveMode.Overwrite).parquet(poolDir(path))
  }

  private def appendTo(spark: SparkSession, delta: DataFrame, textCol: String,
      dir: String): Unit = {
    import graft.operators.SwapDir
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(dir))
    val merged = spark.read.parquet(dir)
      .unionByName(Dsir.corpusCounts(delta, textCol, "n"))
      .groupBy(col("token")).agg(sum(col("n")).as("n"))
    val staging = dir + ".staging"
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    SwapDir.swap(fs, new Path(staging), new Path(dir))
  }

  /** Fold new pool documents into the pool counts (the common path). */
  def appendPool(spark: SparkSession, delta: DataFrame, textCol: String,
      path: String): Unit = appendTo(spark, delta, textCol, poolDir(path))

  /** Fold new target documents into the target counts. */
  def appendTarget(spark: SparkSession, delta: DataFrame, textCol: String,
      path: String): Unit = appendTo(spark, delta, textCol, targetDir(path))

  /** Derive the serving ratio from the stored counts — the same
    * smoothing math as [[Dsir.ratioTable]]. */
  def ratio(spark: SparkSession, path: String): Dsir.Ratio = {
    import graft.operators.SwapDir
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(targetDir(path)))
    SwapDir.heal(fs, new Path(poolDir(path)))
    Dsir.ratioFromCounts(
      spark.read.parquet(targetDir(path)).select(col("token"), col("n").as("nt")),
      spark.read.parquet(poolDir(path)).select(col("token"), col("n").as("np")),
      "token")
  }
}
