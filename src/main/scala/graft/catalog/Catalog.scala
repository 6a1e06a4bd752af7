package graft.catalog

import graft.core.IcebergSchema
import graft.format.{PartitionSpec, SortOrder, TableMetadata}
import graft.table.Table

/** Catalog abstraction (reference `catalog/catalog.go` interface): concrete
  * implementations provide storage + CAS; everything above (scan planning,
  * writes, maintenance) is catalog-agnostic.
  */
trait Catalog {
  def createTable(name: String, schema: IcebergSchema, spec: PartitionSpec,
      sortOrder: SortOrder = SortOrder.Unsorted,
      properties: Map[String, String] = Map.empty): Table
  def loadTable(name: String): Table
  def dropTable(name: String): Unit
  def tableExists(name: String): Boolean
  def listTables(): Seq[String]
  def currentVersion(name: String): Option[Int]
  /** CAS commit of new metadata against the expected version; throws
    * CommitConflict on a lost race.
    */
  def commit(name: String, base: TableMetadata, updated: TableMetadata,
      expectedVersion: Int): String
  /** Location-string CAS variant: backends whose current pointer IS a path
    * string (Hive `metadata_location`) compare the full expected location —
    * strictly stronger than the version number, catching a same-version
    * pointer swap via register/manual edit (reference `hive.go:577-640`
    * compares locations, never parsed versions). Default delegates to the
    * version CAS for backends where the version IS the pointer.
    */
  def commit(name: String, base: TableMetadata, updated: TableMetadata,
      expectedVersion: Int, expectedLocation: Option[String]): String =
    commit(name, base, updated, expectedVersion)
  /** View + UDF declaration store co-located with the tables; None when the
    * backend has no warehouse to anchor one (reference: view support is
    * per-catalog-backend, `catalog/catalog.go` ErrNoSuchView surface).
    */
  def viewStore: Option[ViewStore] = None

  /** Drop+recreate commit guard (the reference's table-uuid invariant,
    * `refresh_uuid_test.go`, applied at the CAS): version numbers and the
    * deterministic vN metadata paths the CAS compares can COLLIDE across
    * table incarnations — drop the table, recreate it under the same name,
    * advance it to the stale writer's expected version, and the bare CAS
    * would let that writer clobber the new table with metadata derived from
    * the dead one. The uuid cannot collide, so each backend's commit calls
    * this with its freshly-read current pointer before flipping it. Either
    * side missing a uuid (legacy v1 metadata) disables the check; an
    * unreadable current pointer is left for the CAS itself to surface.
    * Non-retryable by design: a retry would rebase onto the wrong table.
    */
  protected def requireSameIncarnation(name: String, base: TableMetadata,
      currentLocation: Option[String]): Unit = {
    if (base.tableUuid.isEmpty) return
    currentLocation.foreach { loc =>
      val cur =
        try TableMetadata.fromJson(graft.table.Locations.readMetadataJson(loc))
        catch { case _: Exception => return }
      if (cur.tableUuid.nonEmpty && cur.tableUuid != base.tableUuid)
        throw new IllegalStateException(
          s"table $name uuid changed: expected ${base.tableUuid}, found " +
            s"${cur.tableUuid} — the table was dropped and recreated; " +
            "refusing to commit into the new incarnation")
    }
  }
}

/** URI-scheme registry (reference `catalog/registry.go`): `hadoop:<path>`
  * (or a bare path) resolves to a filesystem catalog; new schemes register
  * a factory.
  */
object Catalogs {
  private val factories =
    new java.util.concurrent.ConcurrentHashMap[String, String => Catalog]()

  register("hadoop", path => new HadoopCatalog(path))
  register("sql", rest => SqlCatalog.fromUri(rest))
  register("rest", rest => graft.rest.RestCatalog.fromUri(rest))
  register("hive", rest => HiveCatalog.fromUri(rest))

  def register(scheme: String, factory: String => Catalog): Unit = {
    factories.put(scheme, factory)
    ()
  }

  def load(uri: String): Catalog = {
    val (scheme, rest) = uri.split(":", 2) match {
      case Array(s, r) if factories.containsKey(s) => (s, r)
      case _ => ("hadoop", uri) // bare path = filesystem catalog
    }
    Option(factories.get(scheme)).getOrElse(
      throw new IllegalArgumentException(s"no catalog registered for scheme $scheme"))
      .apply(rest.stripPrefix("//"))
  }
}
