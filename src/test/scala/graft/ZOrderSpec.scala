package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.ZOrder

/** Morton-key arithmetic: hand-checked interleaving, clamping, null
  * handling, and the locality property that makes z-order a layout win
  * (quadrant-local points sort adjacently).
  */
class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def keys(rows: Seq[(Option[Long], Option[Long])], bits: Int): Seq[Long] = {
    import spark.implicits._
    val df = rows.toDF("x", "y")
    df.select(ZOrder.zorderKey(Seq(col("x"), col("y")),
        Seq(0.0, 0.0), Seq(3.0, 3.0), bits).as("z"))
      .collect().map(_.getLong(0)).toSeq
  }

  test("hand-checked 2-bit interleave: bit b of col i lands at b*m+i") {
    // ranks: x=3 (11b) -> positions 0,2 = 0b0101; y=1 (01b) -> position 1
    val out = keys(Seq((Some(3L), Some(1L)), (Some(0L), Some(0L)),
      (Some(3L), Some(3L)), (Some(1L), Some(2L))), bits = 2)
    assert(out(0) === 7L)   // 0101 | 0010
    assert(out(1) === 0L)
    assert(out(2) === 15L)  // 0101 | 1010
    assert(out(3) === 9L)   // x=01->0b0001, y=10->0b1000
  }

  test("nulls rank 0 and out-of-range values clamp") {
    val out = keys(Seq((None, Some(3L)), (Some(100L), Some(0L))), bits = 2)
    assert(out(0) === 10L) // x null -> 0; y=3 -> 1010
    assert(out(1) === 5L)  // x clamps to rank 3 -> 0101
  }

  test("locality: same-quadrant points are closer in key space than cross-quadrant") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 1L), (3L, 3L)).toDF("x", "y")
    val z = df.select(ZOrder.zorderKey(Seq(col("x"), col("y")),
        Seq(0.0, 0.0), Seq(3.0, 3.0), 2).as("z"))
      .collect().map(_.getLong(0))
    assert(math.abs(z(0) - z(1)) < math.abs(z(0) - z(2)))
  }

  test("degenerate range (min == max) yields rank 0, not divide-by-zero") {
    import spark.implicits._
    val df = Seq((5L, 7L)).toDF("x", "y")
    val z = df.select(ZOrder.zorderKey(Seq(col("x"), col("y")),
        Seq(5.0, 0.0), Seq(5.0, 7.0), 4).as("z")).head().getLong(0)
    // x contributes nothing; y = rank 15 interleaved at odd positions
    assert(z === (0 until 4).map(b => 1L << (2 * b + 1)).sum)
  }
}
