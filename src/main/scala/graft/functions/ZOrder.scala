package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaved-bit keys for multi-dimensional data
  * clustering: rows sorted by the key land in files whose min/max bounds
  * are tight on EVERY participating column, so a scan filtering on any
  * subset of them prunes files — the layout story single-column sort
  * orders cannot give (a sort on c1 leaves c2 scattered across every
  * file). This is the strategy behind `rewrite_data_files(strategy =>
  * 'sort', sort_order => zorder(...))` in the Iceberg ecosystem, applied
  * here by [[graft.table.Maintenance.rewriteDataFiles]]'s `zorderBy`.
  *
  * The key is a pure codegen-friendly expression tree (shifts, masks,
  * ORs — no UDF): each column normalizes into a `bits`-wide integer rank
  * against driver-supplied min/max, and bit b of rank i lands at position
  * b·m + i of the key. Normalization runs in double space so arbitrary
  * long ranges cannot overflow; ranks clamp to [0, 2^bits), making the
  * key total and null-safe (nulls rank 0 — they cluster together at the
  * curve's origin).
  */
object ZOrder {

  /** Morton key over `cols`. `mins`/`maxs` are the per-column value ranges
    * (driver-side, from one aggregation over the input); `bits` is the
    * per-column resolution — m·bits must fit a signed long.
    */
  def zorderKey(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
      bits: Int = 16): Column = {
    val m = cols.size
    require(m >= 1 && mins.size == m && maxs.size == m,
      s"zorderKey: ${mins.size}/${maxs.size} ranges for $m columns")
    require(bits >= 1 && m * bits <= 63,
      s"zorderKey: $m cols x $bits bits exceeds a signed long")
    val maxRank = (1L << bits) - 1
    val ranks = cols.zip(mins.zip(maxs)).map { case (c, (lo, hi)) =>
      if (!(hi > lo)) lit(0L)
      else coalesce(
        least(lit(maxRank), greatest(lit(0L),
          ((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(maxRank.toDouble))
            .cast("long"))),
        lit(0L))
    }
    ranks.zipWithIndex.flatMap { case (r, i) =>
      (0 until bits).map(b =>
        shiftleft(shiftright(r, b).bitwiseAND(lit(1L)), b * m + i))
    }.reduce(_ bitwiseOR _)
  }
}
