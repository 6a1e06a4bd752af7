package graft.queries

/** Iceberg round-trip queries (write testdata into Iceberg tables, read back
  * through the scan planner, compare against DuckDB over the raw parquet).
  * Populated once the format layer lands; empty seq keeps SparkEntry stable.
  */
object IcebergQueries {
  val defs: Seq[QueryDef] = Seq.empty
}
