package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing for training-data preparation: assign each
  * document to a fixed-budget bin (a training context window) in a single
  * deterministic pass, so a downstream trainer can concatenate each bin into
  * one sequence.
  *
  * Packing rule: documents are walked in `orderCol` order within each group;
  * a document whose cumulative token count crosses a bin boundary stays in
  * the bin it started in (bins overflow by at most one document's tokens,
  * never split a document). This boundary-crossing rule is a prefix-sum —
  * `bin = floor((cumsum − ntok) / budget)` — so it is one window over the
  * group instead of a sequential greedy loop, and any SQL engine reproduces
  * it exactly.
  */
object Packing {

  /** Assign a `pack_bin` (and the `pack_tokens` count that placed it) to
    * every document.
    *
    * Scale shape: the window runs per (group, shard). With `shards = 1`
    * each group packs on one task — fine when groups (sources, domains) are
    * bounded; for a 100 TB corpus with giant groups, raise `shards` so each
    * group splits into `shards` deterministic sub-streams (keyed by an LCG
    * on the order column, not a platform hash) that pack independently and
    * in parallel; bins never span shards, so the result is still a valid
    * packing — just `shards` open bins per group instead of one.
    */
  def packByTokenBudget(docs: DataFrame, budget: Long, tokens: Column,
      groupCols: Seq[String] = Seq("source"), orderCol: String = "doc_id",
      shards: Int = 1): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val sharded =
      if (shards > 1) docs.withColumn("pack_shard",
        pmod(Sampling.lcg(col(orderCol)), lit(shards.toLong)))
      else docs.withColumn("pack_shard", lit(0L))
    val w = Window
      .partitionBy(groupCols.map(col) :+ col("pack_shard"): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("pack_tokens", tokens.cast("long"))
      .withColumn("pack_bin",
        floor((sum(col("pack_tokens")).over(w) - col("pack_tokens")) / lit(budget)))
  }
}
