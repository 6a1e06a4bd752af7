package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Events

/** Edge semantics for the event-stream operators (happy path is oracle-gated
  * in q10/q11 against DuckDB's native ASOF JOIN).
  */
class EventsOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("asofJoin: <= match, same-instant wins, no-prior stays null, latest wins") {
    import spark.implicits._
    val clicks = Seq((1L, 100L, "c1"), (1L, 50L, "c0"), (1L, 10L, "cEarly"), (2L, 5L, "cOther"))
      .toDF("user", "t", "name")
    val buys = Seq((1L, 50L, 7.0), (1L, 90L, 9.0), (3L, 1L, 99.0))
      .toDF("user", "t", "price")
    val out = Events.asofJoin(clicks, buys, "user", "t", Seq("price"))
      .select("name", "price_asof").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out("c1") === Some(9.0))     // latest prior (90 < 100), not 50
    assert(out("c0") === Some(7.0))     // same instant matches (<=)
    assert(out("cEarly") === None)      // nothing at or before t=10
    assert(out("cOther") === None)      // user 2 has no purchases at all
  }

  test("asofJoin: duplicate (key,time) right rows tie-break to the greatest tuple; " +
      "a null in the matched row is preserved, not back-filled") {
    import spark.implicits._
    val clicks = Seq((1L, 100L, "late"), (1L, 60L, "mid")).toDF("user", "t", "name")
    // two purchases at the SAME (user, t=50): greatest (price, tag) tuple must
    // win deterministically; the t=80 row has a NULL price that must survive
    // (the pre-fix bug pulled price from t=50 while tag came from t=80)
    val buys = Seq(
      (1L, 50L, Some(3.0), "a"), (1L, 50L, Some(8.0), "b"),
      (1L, 80L, None: Option[Double], "later"))
      .toDF("user", "t", "price", "tag")
    val out = Events.asofJoin(clicks, buys, "user", "t", Seq("price", "tag"))
      .select("name", "price_asof", "tag_asof").collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1))), r.getString(2))).toMap
    assert(out("mid") === ((Some(8.0), "b")))    // greatest tuple at the tie
    assert(out("late") === ((None, "later")))    // matched row's null preserved; both cols same row
  }

  test("sessionize: gap splits, equal timestamps share a session, ids dense per key") {
    import spark.implicits._
    val df = Seq((1L, 0L), (1L, 10L), (1L, 10L), (1L, 200L), (2L, 0L), (2L, 500L))
      .toDF("user", "t")
    val out = Events.sessionize(df, "user", "t", gap = 100L)
      .select("user", "t", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 0L)) === 1 && out((1L, 10L)) === 1)
    assert(out((1L, 200L)) === 2)          // 190 > 100 gap
    assert(out((2L, 0L)) === 1 && out((2L, 500L)) === 2) // per-key numbering
  }

  test("funnelStage: greedy anchor, window cutoff, ordering, and one-stage-per-event") {
    import spark.implicits._
    val e = Seq(
      // u1: full funnel, click at the anchor instant (>= allows it)
      (1L, 10L, "view"), (1L, 10L, "click"), (1L, 30L, "buy"),
      // u2: buy BEFORE the click → stage stops at click
      (2L, 10L, "view"), (2L, 15L, "buy"), (2L, 20L, "click"),
      // u3: click outside the window of the FIRST view (greedy anchor at 10,
      // window 50 → click at 100 ineligible even though view at 90 would fit)
      (3L, 10L, "view"), (3L, 90L, "view"), (3L, 100L, "click"),
      // u4: no anchor event at all
      (4L, 10L, "click"), (4L, 20L, "buy"))
      .toDF("user", "t", "et")
    val out = Events.funnelStage(e, "user", "t", "et",
        Seq("view", "click", "buy"), window = 50L)
      .select("user", "stage", "anchor_time", "convert_time").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out(1L) === ((3, 10L, 30L)))
    assert(out(2L) === ((2, 10L, -1L))) // buy at 15 can't fill stage 3 before click
    assert(out(3L) === ((1, 10L, -1L))) // greedy: anchor is the FIRST view
    assert(out(4L) === ((0, -1L, -1L)))
  }

  test("cohortRetention: integer week buckets, distinct within bucket, cohort from min") {
    import spark.implicits._
    val e = Seq(
      (1L, 5L), (1L, 6L), (1L, 25L),   // cohort 0; buckets 0 and 2; dup in bucket 0
      (2L, 12L), (2L, 22L))            // cohort 1; buckets 1 and 2 → offsets 0, 1
      .toDF("user", "t")
    val out = Events.cohortRetention(e, "user", "t", weekUnit = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map((0L, 0L) -> 1L, (0L, 2L) -> 1L, (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }
}
