package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (a.k.a. point-in-time join): for every left row, attach
  * the single most recent right row with the same key whose time is
  * `<=` the left row's time.
  *
  * Spark has no built-in as-of join, and the naive formulations do not
  * scale: a broadcast range join materializes |L|x|R| per key before
  * filtering, and a per-key `collect` is driver-bound. This
  * implementation uses the union/last-value trick:
  *
  *   1. tag right rows side=0, left rows side=1,
  *   2. union them on (key, time, side),
  *   3. one window sort per key ordered by (time, side) — at equal
  *      timestamps the right row sorts first so `<=` semantics hold,
  *   4. `last(right_payload, ignoreNulls)` over rowsBetween(-inf, 0)
  *      carries the latest right payload forward,
  *   5. keep left rows only.
  *
  * Cost: ONE shuffle of |L|+|R| rows and one sort — the same cost
  * profile as a sort-merge join, no row explosion. Per-key skew is
  * handled by AQE; the window itself is streaming (running last, no
  * frame buffering).
  */
object AsOfJoin {

  /** @param left           left (probe) side
    * @param right          right (quote) side
    * @param keyCols        equi-key column names present on BOTH sides
    * @param leftTimeCol    event-time column on the left
    * @param rightTimeCol   event-time column on the right
    * @param rightValueCols right columns to attach (must not collide
    *                       with left column names)
    * @return left.* plus rightValueCols (null when no right row at or
    *         before the left time exists for the key)
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    val payload = struct(rightValueCols.map(col): _*)

    // a NULL right time can never satisfy "right time <= left time";
    // without this filter the nulls-first sort would carry its payload
    // to every left row of the key
    val rTagged = right.filter(col(rightTimeCol).isNotNull).select(
      keyCols.map(col) ++ Seq(
        col(rightTimeCol).as("__t"),
        lit(0).as("__side"),
        payload.as("__rpay")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTimeCol).cast(right.schema(rightTimeCol).dataType).as("__t"),
        lit(1).as("__side"),
        lit(null).cast(rTagged.schema("__rpay").dataType).as("__rpay")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rTagged.unionByName(lTagged)
      .withColumn("__last", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightValueCols.map(c => col(s"__last.$c").as(c)): _*)
  }

  /** Native-operator form of [[asofBackward]]: plans through
    * `graft.plans.AsOfJoinPlan` into the custom `AsOfJoinExec`
    * streaming-merge operator (one shuffle per side, sorted merge, no
    * unioned super-table and no window). Same semantics and arguments;
    * the strategy is registered on the session on first use.
    */
  def asofBackwardExec(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project

    val spark = left.sparkSession
    graft.plans.GraftExtensions.ensureAsOfStrategy(spark)

    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // self-join safety: if the two sides share attribute ids (common
    // when both derive from one scan), re-alias the right side the way
    // the analyzer deduplicates ordinary join children
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).nonEmpty)
        Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
      else rPlan0

    val lByName = lPlan.output.map(a => a.name -> a).toMap
    val rByName = rPlan.output.map(a => a.name -> a).toMap
    val lTime = lByName(leftTimeCol)
    val rTime = rByName(rightTimeCol)
    require(lTime.dataType == rTime.dataType,
      s"as-of time columns must share a type, got ${lTime.dataType} vs ${rTime.dataType}")
    keyCols.foreach { k =>
      require(lByName(k).dataType == rByName(k).dataType,
        s"as-of key '$k' type mismatch: ${lByName(k).dataType} vs ${rByName(k).dataType}")
    }

    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
      graft.plans.AsOfJoinPlan(lPlan, rPlan,
        keyCols.map(lByName), keyCols.map(rByName),
        lTime, rTime, rightValueCols.map(rByName)))
  }
}
