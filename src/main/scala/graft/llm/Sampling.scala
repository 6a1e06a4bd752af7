package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data curation: exactly k
  * documents per stratum (e.g. language × source), chosen by a keyed
  * pseudo-random order any engine can reproduce — an LCG over the id, not a
  * platform hash, so a SQL oracle computes the identical sample.
  */
object Sampling {

  /** Pseudo-random but engine-portable ordering key: one LCG step. Stays
    * within long range for ids up to ~8e9, so the same arithmetic runs
    * overflow-free in ANSI SQL (DuckDB errors on BIGINT overflow rather
    * than wrapping like the JVM).
    */
  def lcg(id: Column): Column = (id * lit(1103515245L) + lit(12345L)) % lit(2147483648L)

  /** Exact k-per-stratum sample.
    *
    * Scale shape: a single `row_number` window serializes each stratum
    * through one task's sort, and corpus strata are huge and few (a handful
    * of languages × sources over 100 TB). The rank instead runs TWICE over
    * salted sub-strata: phase 1 ranks within (stratum, salt) — `salts`×
    * the parallelism, each sub-stratum a spillable sort — and keeps at most
    * k·salts survivors per stratum; phase 2 ranks only those survivors, so
    * its window input is bounded by k·salts·|strata| regardless of corpus
    * size. Exact because the global k smallest of a stratum are each the
    * smallest within their own salt bucket.
    */
  def stratifiedTopK(df: DataFrame, strata: Seq[String], idCol: String,
      k: Int, salts: Int = 16): DataFrame = {
    val order = Seq(lcg(col(idCol)).asc, col(idCol).asc)
    val w1 = Window
      .partitionBy(strata.map(col) :+ pmod(col(idCol), lit(salts.toLong)): _*)
      .orderBy(order: _*)
    val w2 = Window.partitionBy(strata.map(col): _*).orderBy(order: _*)
    df.withColumn("__rk1", row_number().over(w1)).filter(col("__rk1") <= k)
      .withColumn("__rk", row_number().over(w2)).filter(col("__rk") <= k)
      .drop("__rk1", "__rk")
  }
}
