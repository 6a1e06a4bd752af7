package graft.catalog

import graft.core.IcebergSchema
import graft.format.{PartitionSpec, SortOrder, TableMetadata}
import graft.table.Table

/** One table's staged (uncommitted) metadata update. */
final case class StagedCommit(name: String, base: TableMetadata,
    updated: TableMetadata, expectedVersion: Int)

/** Catalogs able to commit several tables' updates atomically (reference
  * `catalog/multi_table_transaction.go:50-154` requires the analogous
  * TransactionalCatalog capability).
  */
trait TransactionalCatalog extends Catalog {
  /** Commit all staged updates or none: every table's version advances
    * exactly once, and any CAS failure rolls the whole set back with a
    * `CommitConflict`.
    */
  def commitTransaction(commits: Seq[StagedCommit]): Unit
}

/** Atomic commits spanning tables (reference
  * `catalog/multi_table_transaction.go:50-154`): table operations run with
  * their final catalog commit CAPTURED instead of applied, then every staged
  * update commits through the catalog's transactional CAS.
  *
  * {{{
  * val txn = new MultiTableTransaction(catalog)
  * txn.run(tableA)(t => Writer.append(spark, t, dfA))
  * txn.run(tableB)(t => Writer.append(spark, t, dfB))
  * txn.commit() // both version hints advance, or neither
  * }}}
  *
  * Data files written by staged operations land immediately (they are
  * unreachable orphans if the transaction never commits — the same garbage
  * contract as any failed commit, collected by orphan cleanup).
  */
final class MultiTableTransaction(catalog: Catalog) {

  private val txnCat: TransactionalCatalog = catalog match {
    case tc: TransactionalCatalog => tc
    case _ => throw new IllegalArgumentException(
      "catalog does not support multi-table transactions")
  }

  private val staged =
    scala.collection.mutable.LinkedHashMap.empty[String, StagedCommit]
  private var committed = false

  /** Run `op` against `table` with its commit staged into this transaction.
    * Returns the table's staged (post-op, uncommitted) state. One staged
    * operation per table, mirroring the reference's duplicate-table check.
    */
  def run(table: Table)(op: Table => Table): Table = {
    require(!committed, "multi-table transaction has already been committed")
    require(!staged.contains(table.name),
      s"duplicate table in multi-table transaction: ${table.name}")
    val cat = new StagingCatalog(table.name)
    val out = op(new Table(table.name, table.metadata, table.metadataPath, cat))
    val c = cat.captured.getOrElse(
      throw new IllegalStateException(s"operation on ${table.name} committed nothing"))
    staged(table.name) = c
    out
  }

  /** Commit every staged update atomically. On conflict nothing is applied
    * and the transaction may be rebuilt and retried.
    */
  def commit(): Seq[Table] = {
    require(!committed, "multi-table transaction has already been committed")
    require(staged.nonEmpty, "empty commit list")
    txnCat.commitTransaction(staged.values.toSeq)
    committed = true
    staged.keys.map(catalog.loadTable).toSeq
  }

  /** Captures the single catalog commit an operation performs, validating
    * its CAS base against the REAL catalog so stale handles surface at
    * staging time, not commit time.
    */
  private final class StagingCatalog(tableName: String) extends Catalog {
    var captured: Option[StagedCommit] = None

    def commit(name: String, base: TableMetadata, updated: TableMetadata,
        expectedVersion: Int): String = {
      require(name == tableName, s"staging catalog for $tableName got commit for $name")
      require(captured.isEmpty,
        s"one staged commit per table per transaction ($name committed twice)")
      val cur = catalog.currentVersion(name).getOrElse(0)
      if (cur != expectedVersion)
        throw new CommitConflict(
          s"$name: expected version $expectedVersion but found $cur")
      captured = Some(StagedCommit(name, base, updated, expectedVersion))
      stagedPath(expectedVersion + 1)
    }

    // a path whose v<N> parses to the staged version, so Table.currentVersion
    // on the staged handle reflects the reserved CAS base
    private def stagedPath(v: Int): String =
      s"${updatedLocation}/metadata/v$v.metadata.json"
    private def updatedLocation: String =
      captured.map(_.updated.location).getOrElse(
        catalog.loadTable(tableName).location)

    def loadTable(name: String): Table = captured match {
      case Some(c) if name == tableName =>
        new Table(name, c.updated, stagedPath(c.expectedVersion + 1), this)
      case _ =>
        val t = catalog.loadTable(name)
        // rebind to the staging catalog: a retrying writer that refreshes a
        // stale handle must keep committing HERE, not escape to the real
        // catalog
        if (name == tableName) new Table(name, t.metadata, t.metadataPath, this)
        else t
    }

    def createTable(name: String, schema: IcebergSchema, spec: PartitionSpec,
        sortOrder: SortOrder, properties: Map[String, String]): Table =
      throw new UnsupportedOperationException("createTable inside a multi-table transaction")
    def dropTable(name: String): Unit =
      throw new UnsupportedOperationException("dropTable inside a multi-table transaction")
    def tableExists(name: String): Boolean = catalog.tableExists(name)
    def listTables(): Seq[String] = catalog.listTables()
    def currentVersion(name: String): Option[Int] = catalog.currentVersion(name)
  }
}
