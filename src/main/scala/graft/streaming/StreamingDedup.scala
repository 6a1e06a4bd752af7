package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stateful streaming exact-dedup for continuous corpus ingestion: a
  * document is emitted only the FIRST time its content key is seen across
  * the life of the stream (state survives restarts via the checkpoint).
  *
  * Spark-first: this is the built-in streaming `dropDuplicates` state
  * machine, not a custom `flatMapGroupsWithState` — the state store
  * (HDFS-backed or RocksDB) shards by key across executors, so state
  * capacity scales horizontally with the cluster.
  */
object StreamingDedup {

  /** Dedup keyed by a 64-bit content hash of `keys` instead of the raw
    * columns: state per distinct document is one long, not the full text —
    * the difference between state that fits and state that doesn't at
    * billions of documents. Trade-off: a 2^-64-probability hash collision
    * drops a non-duplicate; use [[dedupExact]] when that is unacceptable.
    */
  def dedupByHash(df: DataFrame, keys: Seq[String]): DataFrame =
    df.withColumn("__dedup_key", xxhash64(keys.map(col): _*))
      .dropDuplicates("__dedup_key")
      .drop("__dedup_key")

  /** Collision-free variant: state keys on the raw columns. */
  def dedupExact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Bounded-state variant: suppresses duplicates only within the watermark
    * horizon and lets state age out — the right call when duplicates are
    * temporally clustered (retries, replays) rather than corpus-wide.
    */
  def dedupWithinWatermark(df: DataFrame, keys: Seq[String], timeCol: String,
      delay: String): DataFrame =
    df.withWatermark(timeCol, delay)
      .withColumn("__dedup_key", xxhash64(keys.map(col): _*))
      .dropDuplicatesWithinWatermark("__dedup_key")
      .drop("__dedup_key")
}
