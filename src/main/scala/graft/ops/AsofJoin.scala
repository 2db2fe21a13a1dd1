package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single right row with
  * the greatest timestamp <= the left row's timestamp within the same key —
  * the canonical feature-lookup / market-data operator.
  *
  * Spark-first shape: tag + unionByName both sides, ONE shuffle on the key,
  * one in-partition sort by (ts, tag), and a running `last(..., ignoreNulls)`
  * window carries the most recent right payload forward into each left row.
  * Never builds the range join's quadratic candidate set, so wall-clock is
  * sort-merge-ish O(n log n) per key regardless of how far back matches are.
  * The right payload rides in a STRUCT so the match is row-atomic — a right
  * row with some NULL value columns can't tear into values from different
  * right rows. */
object AsofJoin {

  /** @param on        equality key columns (present in both sides)
    * @param tsCol     ordering column (same name both sides; any ordered type)
    * @param valueCols right-side payload columns to surface (names must not
    *                  collide with left columns — pre-rename on the right)
    * @param joinType  "inner" drops left rows with no prior right row;
    *                  "left" keeps them with NULL payload
    * @param strict    false → a right row AT the left timestamp matches
    *                  (DuckDB ASOF `>=`); true → only strictly earlier rows
    * @param tolerance max lookback (pandas merge_asof tolerance): a match
    *                  further than this behind the left timestamp is treated
    *                  as no match. Requires a numeric `tsCol`; same unit. */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String], tsCol: String,
      valueCols: Seq[String], joinType: String = "inner",
      strict: Boolean = false, tolerance: Option[Long] = None): DataFrame = {
    require(Seq("inner", "left").contains(joinType), s"joinType inner|left, got $joinType")
    require(valueCols.nonEmpty, "asofJoin needs at least one right value column")
    require(tolerance.forall(_ > 0), s"tolerance must be positive: $tolerance")
    val collisions = valueCols.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"right value columns collide with left columns: ${collisions.mkString(",")}")
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__tag", lit(1))
    val r = right.select((on :+ tsCol).map(col) ++ valueCols.map(col): _*)
      .withColumn("__tag", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows at ts == left ts sort before the left row (visible to it)
    // unless strict; ties among right rows resolve to the last in (ts, tag)
    // order — callers needing total determinism pre-aggregate the right side
    // to one row per (key, ts), as q42 does.
    val tagOrder = if (strict) col("__tag").desc else col("__tag").asc
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col(tsCol).asc, tagOrder)
      .rowsBetween(Window.unboundedPreceding, 0)
    // the matched right ts rides in the struct so a tolerance check can
    // disqualify too-old matches after the fact, payload-atomically
    val packed = when(col("__tag") === 0,
      struct(col(tsCol).as("__rts") +: valueCols.map(col): _*))
    val matched0 = u
      .withColumn("__m0", last(packed, ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val matched = tolerance match {
      case None => matched0.withColumn("__m", col("__m0"))
      case Some(t) => matched0.withColumn("__m",
        when(col("__m0").isNotNull &&
          col(tsCol) - col("__m0").getField("__rts") <= t, col("__m0")))
    }
    val kept =
      if (joinType == "inner") matched.filter(col("__m").isNotNull) else matched
    kept.select(leftCols.map(col) ++
      valueCols.map(v => col("__m").getField(v).as(v)): _*)
  }
}
