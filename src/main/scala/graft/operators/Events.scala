package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators Spark lacks as built-ins, composed from windows
  * instead of custom physical plans: as-of join and gap sessionization.
  * Both shuffle ONCE on the entity key and then run ordered window passes
  * over co-located partitions — the shape that scales to a 100 TB event log
  * (no per-row range probe, no broadcast of the right side, no state store).
  */
object Events {

  /** As-of join: for each left row, the most recent right row with
    * `right.time <= left.time` for the same key (classic trades←quotes /
    * clicks←purchases enrichment).
    *
    * Implementation: tag both sides, union by name, and forward-fill ONE
    * struct of the right side's values with `last(_, ignoreNulls)` over one
    * (key, time)-ordered window — a single shuffle on `key`, linear scan
    * per partition. Filling a single struct (not each value column
    * independently) guarantees every emitted column comes from the SAME
    * right row and that a null value IN the matched row is preserved as
    * null rather than back-filled from an older row. At equal timestamps
    * the right row sorts first, so a same-instant right row IS matched
    * (`<=` semantics, like ASOF JOIN in SQL engines). Rows on the left with
    * no prior right row keep nulls (left-outer semantics).
    *
    * Determinism under duplicate (key, time) right rows: the window's final
    * sort key is the value struct itself, so the GREATEST `rightVals` tuple
    * (field-by-field comparison, nulls smallest) wins — the result is a
    * pure function of the data, never of partition order. `rightVals`
    * types must therefore be orderable (no maps).
    *
    * `rightVals` columns are emitted with `suffix` appended; all other
    * right-side columns are dropped.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      rightVals: Seq[String], suffix: String = "_asof"): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right.select(col(key), col(time),
        struct(rightVals.map(v => col(v).as(v + suffix)): _*).as("__rv"))
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__side").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filledDf = u.withColumn("__f", last(col("__rv"), ignoreNulls = true).over(w))
    val out = rightVals.foldLeft(filledDf.filter(col("__side") === 1)) {
      (df, v) => df.withColumn(v + suffix, col("__f").getField(v + suffix))
    }
    out.drop("__side", "__rv", "__f")
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same key exceeds `gapMillisOrUnits` (in the unit
    * of `time`). Emits `session_id`, dense per key starting at 1.
    *
    * Two window passes (lag to flag session starts, running sum to number
    * them) over the same (key, time) ordering — Spark plans them on one
    * exchange+sort. Rows with equal timestamps always share a session
    * (gap 0), so ordering ties cannot change the result.
    */
  def sessionize(df: DataFrame, key: String, time: String,
      gap: Long): DataFrame = {
    val ord = Window.partitionBy(col(key)).orderBy(col(time).asc)
    val prev = lag(col(time), 1).over(ord)
    df.withColumn("__new",
        when(prev.isNull || (col(time) - prev) > gap, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }
}
