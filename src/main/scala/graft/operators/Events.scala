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

  /** Ordered-funnel stage per key (view→click→purchase-style conversion):
    * stage 1 anchors at the key's EARLIEST `steps(0)` event; stage i>1 is
    * the earliest `steps(i)` event at-or-after the stage-(i-1) event and
    * within `window` (time units) of the anchor. Greedy earliest-match —
    * the classic product-analytics definition, and the one a min-time
    * chain reproduces in SQL. `steps` must be distinct event types (one
    * event advances at most one stage).
    *
    * One shuffle on `key`; each key's events fold in (time, type) order as
    * a sorted-array aggregate, so cost is O(events-per-key) map work after
    * the exchange and the result is independent of partition order. The
    * per-key array is session/user-sized — bounded in any real event log —
    * not corpus-sized.
    *
    * Output: (key, stage, anchor_time, convert_time) — stage in 0..steps
    * .length, convert_time = the final step's time when the funnel
    * completed, else null.
    */
  def funnelStage(events: DataFrame, key: String, time: String,
      typeCol: String, steps: Seq[String], window: Long): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "funnelStage: steps must be non-empty distinct event types")
    val n = steps.size
    // Same-instant events must fold in STEP order (view before click before
    // purchase), not lexicographic type order — that is what makes the
    // greedy single pass equivalent to the per-stage min-time chain when a
    // later step shares the earlier step's timestamp (>= match).
    val stepIdx = steps.indices.foldLeft(lit(n)) { (acc, i) =>
      when(col(typeCol) === steps(i), lit(i)).otherwise(acc)
    }
    val sorted = array_sort(collect_list(
      struct(col(time).as("t"), stepIdx.as("si"), col(typeCol).as("et"))))
    def fold(st: Column, ev: Column): Column = {
      val t = ev.getField("t")
      val et = ev.getField("et")
      // which stage (0-based) does this event fill? -1 = none. Stage order
      // in the when-chain means one event advances at most one stage.
      val matched = steps.indices.foldLeft(lit(-1)) { (acc, i) =>
        val eligible =
          if (i == 0) element_at(st, 1).isNull && (et === steps(0))
          else element_at(st, i).isNotNull && element_at(st, i + 1).isNull &&
            (et === steps(i)) && (t >= element_at(st, i)) &&
            (t <= element_at(st, 1) + lit(window))
        when(acc === -1 && eligible, lit(i)).otherwise(acc)
      }
      transform(st, (x, idx) => when(idx === matched, t).otherwise(x))
    }
    val init = array_repeat(lit(null).cast("long"), n)
    events.groupBy(col(key))
      .agg(aggregate(sorted, init, fold).as("__st"))
      .select(col(key),
        size(filter(col("__st"), x => x.isNotNull)).as("stage"),
        element_at(col("__st"), 1).as("anchor_time"),
        element_at(col("__st"), n).as("convert_time"))
  }

  /** Weekly cohort retention: cohort = the key's first-event week, and for
    * every (cohort week, week offset) the count of distinct keys active in
    * that week. Weeks are epoch-anchored `time div weekUnit` buckets —
    * pure integer arithmetic, so any engine reproduces the exact counts.
    *
    * Two key-partitioned exchanges (first-event min, then the distinct
    * (key, offset) count), both with map-side partials — no week explode,
    * no windows.
    */
  def cohortRetention(events: DataFrame, key: String, time: String,
      weekUnit: Long): DataFrame = {
    val first = events.groupBy(col(key)).agg(min(col(time)).as("__first"))
    // `div`, not `/`: ns epochs exceed 2^53, so a double-routed division
    // could floor the wrong side of a week boundary
    events.join(first, Seq(key))
      .select(col(key),
        expr(s"__first div ${weekUnit}L").as("cohort_week"),
        (expr(s"$time div ${weekUnit}L") - expr(s"__first div ${weekUnit}L")).as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }
}
