package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join shapes Spark's planner punts on at scale: interval containment
  * (planned as BroadcastNestedLoopJoin when written as a theta join) and
  * hot-key equi-joins (one reducer drowns). Both are re-expressed as plain
  * equi-joins so sort-merge/shuffle-hash machinery — and AQE — apply.
  */
object Joins {

  /** Range (interval-containment) join: pairs each point row with every
    * interval row satisfying `lo <= point <= hi`.
    *
    * A direct `pts.join(iv, pt >= lo && pt <= hi)` has no equi-key, so Spark
    * plans a nested-loop join — O(|pts|·|iv|) compares and a mandatory
    * broadcast of one side, which dies when both sides are large. Instead we
    * discretize time into `binWidth`-sized bins: each interval is exploded to
    * the bins it overlaps, each point maps to exactly one bin, and the pair
    * survives an equi-join on the bin followed by the exact containment
    * predicate. Each (point, interval) match shares >=1 bin and is produced
    * exactly once because only the interval side is exploded — no dedup pass
    * needed. Cost: |iv| * avg(span/binWidth) replicated rows through one
    * hash shuffle, the shape that survives 100x on both sides. Pick
    * `binWidth` ~ the median interval span; AQE splits any residual hot bin.
    *
    * `point`, `lo`, `hi` are non-negative long-valued columns in the same
    * unit (integral `div` truncates toward zero, so negative values would
    * bin incorrectly at the origin).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, point: String,
      lo: String, hi: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // integral `div`, not floor(x / w): at nanosecond magnitudes the double
    // division loses ulps and can flip the bin of a value sitting exactly on
    // a bin boundary, silently dropping that (point, interval) pair
    def bin(c: String) = expr(s"`$c` div ${binWidth}L")
    val iv = intervals.withColumn("__bin",
      explode(sequence(bin(lo), bin(hi))))
    val pt = points.withColumn("__bin", bin(point))
    pt.join(iv, Seq("__bin"))
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("__bin")
  }

  /** Skew-proof equi-join of a fact table against a dimension whose key
    * distribution in the fact is hot (a handful of keys own most rows).
    *
    * Classic salting: replicate every dimension row `salts` times with a
    * salt column, give each fact row a uniformly-spread salt from a cheap
    * deterministic hash of the whole row, and equi-join on (key, salt). The
    * hot key's fact rows now land on `salts` reducers instead of one; the
    * result multiset is exactly the plain join's (each fact row still meets
    * each matching dim row once — under the salt it carries). Dim-side blowup
    * is `salts`x, so keep the dim projected to the joined columns. AQE's
    * skew-join split handles mild skew on its own; salting is for the
    * pathological single-key case where one partition exceeds what a split
    * can fix (or when AQE is off, e.g. inside a cached subtree).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val factS = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toSeq: _*), lit(salts)))
    val dimS = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    factS.join(dimS, Seq(key, "__salt")).drop("__salt")
  }
}
