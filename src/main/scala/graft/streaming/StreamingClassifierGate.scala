package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ml.NaiveBayes

/** Model-gated streaming ingest: score every incoming document with a
  * pre-trained Naive Bayes model and route it by prediction — the
  * streaming form of the quality/domain gate an LLM corpus runs at
  * the door (CCNet-style: admit documents the classifier confidently
  * places in an allowed class, quarantine the rest for review instead
  * of silently dropping them).
  *
  * The model is STATIC during serving (frozen-model semantics, same
  * contract as the frozen-centroid IVF append): each micro-batch joins
  * the batch's exploded tokens against the model table — a
  * stream-static join Spark replans per batch, broadcast when the
  * model fits. Scoring + argmax + margin need two aggregations and a
  * window, which streaming aggregation can't express in one query —
  * so the gate runs the BATCH scorer per micro-batch via foreachBatch
  * (the repo's quarantine pattern): semantics identical to the batch
  * twin by construction, state-free, output APPEND-only to the two
  * parquet dirs.
  *
  * Admission rule: predicted class in `allowed` AND margin (best minus
  * second-best log-score) >= `minMargin`. Margin is the cheap
  * confidence proxy for NB; minMargin = 0 admits on argmax alone.
  */
object StreamingClassifierGate {

  /** Batch scores + margins: `(idCol, predicted, score, margin)`. */
  def scoredWithMargin(model: NaiveBayes.Model, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("label").desc)
    NaiveBayes.scores(model, batch, idCol, textCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 2)
      .groupBy(col(idCol))
      .agg(
        max(when(col("__rn") === 1, col("label"))).as("predicted"),
        max(when(col("__rn") === 1, col("score"))).as("score"),
        (max(when(col("__rn") === 1, col("score"))) -
          coalesce(max(when(col("__rn") === 2, col("score"))),
            max(when(col("__rn") === 1, col("score"))))).as("margin"))
  }

  /** One micro-batch step; exposed for direct (batch) use and tests.
    * Appends admitted rows (+ predicted/score/margin) to `keepDir`,
    * the rest to `quarantineDir` with a `reason` column. */
  def process(
      batch: DataFrame, // (idCol, textCol, ...)
      model: NaiveBayes.Model,
      idCol: String,
      textCol: String,
      allowed: Set[String],
      minMargin: Double,
      keepDir: String,
      quarantineDir: String): Unit = {
    if (batch.isEmpty) return
    // persist: the two routed writes below would otherwise re-run the
    // whole scoring join per sink
    // __admit coalesced to false: a null-id row never equi-joins back
    // from the scorer, so predicted/margin are null and a raw predicate
    // would be null too — filter(p) AND filter(!p) would BOTH drop it,
    // losing the row from keep and quarantine alike. Unscored rows must
    // land in quarantine (the module's no-silent-drop contract).
    val scored = batch.join(
      scoredWithMargin(model, batch, idCol, textCol), Seq(idCol), "left")
      .withColumn("__admit",
        coalesce(
          col("predicted").isin(allowed.toSeq: _*) && col("margin") >= minMargin,
          lit(false)))
      .persist()
    try {
      scored.filter(col("__admit")).drop("__admit")
        .write.mode(SaveMode.Append).parquet(keepDir)
      scored.filter(!col("__admit"))
        .withColumn("reason",
          when(col("predicted").isNull, lit("unscored"))
            .when(!col("predicted").isin(allowed.toSeq: _*), lit("class_not_allowed"))
            .otherwise(lit("low_margin")))
        .drop("__admit")
        .write.mode(SaveMode.Append).parquet(quarantineDir)
    } finally { scored.unpersist(); () }
  }

  /** File-source streaming drive: watch `inDir` for parquet batches of
    * documents, gate each through `process`. */
  def stream(
      spark: SparkSession,
      inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      model: NaiveBayes.Model,
      idCol: String,
      textCol: String,
      allowed: Set[String],
      minMargin: Double,
      keepDir: String,
      quarantineDir: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        process(batch, model, idCol, textCol, allowed, minMargin, keepDir, quarantineDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
