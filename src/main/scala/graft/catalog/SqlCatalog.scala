package graft.catalog

import java.nio.charset.StandardCharsets
import java.sql.{Connection, DriverManager, SQLException}

import graft.core.IcebergSchema
import graft.format._
import graft.io.FileIO
import graft.table.Table

/** JDBC-backed catalog (reference `catalog/sql/sql.go`): table metadata
  * files live in the warehouse exactly as with [[HadoopCatalog]], but the
  * CURRENT-pointer lives in a database row, and the commit CAS is a
  * conditional UPDATE — `... WHERE metadata_location = <expected>` — whose
  * affected-row count decides the race (reference `sql.go:908-930`).
  *
  * Physical layout follows the reference's v1 schema so external tools can
  * read the catalog database directly:
  *  - `iceberg_tables(catalog_name, table_namespace, table_name,
  *    metadata_location, previous_metadata_location, iceberg_type)` with the
  *    three-part primary key (`sql.go:275-296`);
  *  - `iceberg_namespace_properties(catalog_name, namespace, property_key,
  *    property_value)`.
  *
  * Multi-table transactions commit every staged table's conditional UPDATE
  * inside ONE database transaction — the atomicity is the database's, with
  * no unpublishable window (unlike the Hadoop catalog's reserve-then-publish
  * dance this is a true all-or-nothing commit).
  *
  * Tested against embedded Derby; any JDBC url with the same SQL subset
  * works. Table names may be namespaced as `ns.table`; bare names map to the
  * `default` namespace.
  */
final class SqlCatalog(jdbcUrl: String, warehouseRaw: String,
    catalogName: String = "graft") extends TransactionalCatalog {

  private val warehouse: String = FileIO.canonical(warehouseRaw)

  override lazy val viewStore: Option[MetaObjects] = Some(new MetaObjects(warehouse))

  initSchema()

  // ---- naming ------------------------------------------------------------

  private def split(name: String): (String, String) = {
    val i = name.lastIndexOf('.')
    if (i < 0) ("default", name) else (name.substring(0, i), name.substring(i + 1))
  }
  private def join(ns: String, tbl: String): String =
    if (ns == "default") tbl else s"$ns.$tbl"

  private def tableDir(name: String): String = {
    val (ns, tbl) = split(name)
    s"$warehouse/$ns/$tbl"
  }
  private def metadataFile(name: String, v: Int,
      props: Map[String, String] = Map.empty): String =
    s"${tableDir(name)}/metadata/" +
      graft.table.Locations.metadataFileName(v, props)

  /** Version is derived from the recorded location's `v<N>[.codec]
    * .metadata.json` (the Catalog trait speaks versions; the database
    * speaks locations).
    */
  private def versionOf(location: String): Option[Int] =
    graft.table.Locations.metadataVersionOf(location)

  // ---- connections -------------------------------------------------------

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(jdbcUrl)
    try f(c) finally c.close()
  }

  private def initSchema(): Unit = withConn { c =>
    def createQuiet(ddl: String): Unit = {
      val st = c.createStatement()
      try { st.execute(ddl); () }
      catch {
        // Derby X0Y32 = object already exists; other engines raise their own
        // state, so fall back to a probe
        case e: SQLException if e.getSQLState == "X0Y32" => ()
        case e: SQLException =>
          val probe = try {
            val rs = c.getMetaData.getTables(null, null, null, Array("TABLE"))
            var found = false
            while (rs.next() && !found)
              found = rs.getString("TABLE_NAME").equalsIgnoreCase(ddl.split("\\s+")(2))
            found
          } catch { case _: SQLException => false }
          if (!probe) throw e
      } finally st.close()
    }
    createQuiet("""CREATE TABLE iceberg_tables (
      catalog_name VARCHAR(255) NOT NULL,
      table_namespace VARCHAR(255) NOT NULL,
      table_name VARCHAR(255) NOT NULL,
      metadata_location VARCHAR(1000),
      previous_metadata_location VARCHAR(1000),
      iceberg_type VARCHAR(255),
      PRIMARY KEY (catalog_name, table_namespace, table_name))""")
    createQuiet("""CREATE TABLE iceberg_namespace_properties (
      catalog_name VARCHAR(255) NOT NULL,
      namespace VARCHAR(255) NOT NULL,
      property_key VARCHAR(255) NOT NULL,
      property_value VARCHAR(1000),
      PRIMARY KEY (catalog_name, namespace, property_key))""")
  }

  // ---- Catalog -----------------------------------------------------------

  def tableExists(name: String): Boolean = currentLocation(name).isDefined

  def listTables(): Seq[String] = withConn { c =>
    val ps = c.prepareStatement(
      """SELECT table_namespace, table_name FROM iceberg_tables
         WHERE catalog_name = ? ORDER BY table_namespace, table_name""")
    ps.setString(1, catalogName)
    val rs = ps.executeQuery()
    val out = Seq.newBuilder[String]
    while (rs.next()) out += join(rs.getString(1), rs.getString(2))
    out.result()
  }

  def createTable(name: String, schema: IcebergSchema, spec: PartitionSpec,
      sortOrder: SortOrder = SortOrder.Unsorted,
      properties: Map[String, String] = Map.empty): Table = {
    val (ns, tbl) = split(name)
    val meta = TableMetadata.empty(tableDir(name), schema, spec, sortOrder, properties)
    val path = metadataFile(name, 1, meta.properties)
    // create-no-replace: a duplicate create must refuse WITHOUT touching
    // the existing table's v1 file — a plain overwrite here followed by
    // the duplicate-key cleanup below would delete the live table's
    // metadata (caught by the catalog conformance battery)
    try FileIO.createNoReplace(path, graft.table.Locations.encodeMetadata(
      TableMetadata.toJson(meta), meta.properties))
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new IllegalArgumentException(s"table $name already exists")
    }
    val inserted = withConn { c =>
      val ps = c.prepareStatement(
        """INSERT INTO iceberg_tables (catalog_name, table_namespace, table_name,
           metadata_location, previous_metadata_location, iceberg_type)
           VALUES (?, ?, ?, ?, NULL, 'TABLE')""")
      ps.setString(1, catalogName); ps.setString(2, ns); ps.setString(3, tbl)
      ps.setString(4, path)
      try { ps.executeUpdate(); true }
      catch { case e: SQLException if isDuplicateKey(e) => false }
    }
    if (!inserted) {
      try { FileIO.delete(path); () } catch { case _: Exception => () }
      throw new IllegalArgumentException(s"table $name already exists")
    }
    new Table(name, meta, path, this)
  }

  def loadTable(name: String): Table = {
    val path = currentLocation(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    val meta = TableMetadata.fromJson(
      graft.table.Locations.readMetadataJson(path))
    new Table(name, meta, path, this)
  }

  def dropTable(name: String): Unit = {
    val (ns, tbl) = split(name)
    withConn { c =>
      val ps = c.prepareStatement(
        """DELETE FROM iceberg_tables
           WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?""")
      ps.setString(1, catalogName); ps.setString(2, ns); ps.setString(3, tbl)
      ps.executeUpdate()
    }
    FileIO.deleteTree(tableDir(name))
    ()
  }

  def currentVersion(name: String): Option[Int] =
    currentLocation(name).flatMap(versionOf)

  /** Single-table CAS commit: write the new metadata file, then flip the
    * database pointer conditionally on the expected current location. The
    * row count IS the race decision; a loser's freshly-written file is
    * removed again.
    */
  def commit(name: String, base: TableMetadata, updated: TableMetadata,
      expectedVersion: Int): String = {
    // version numbers collide across drop+recreate incarnations; uuids don't
    requireSameIncarnation(name, base, currentLocation(name))
    val newPath = stageMetadataFile(name, updated, expectedVersion)
    val won = withConn(c => casUpdate(c, name, expectedVersion, newPath) == 1)
    if (!won) {
      try { FileIO.delete(newPath); () } catch { case _: Exception => () }
      val cur = currentVersion(name).getOrElse(0)
      throw new CommitConflict(s"expected version $expectedVersion but found $cur")
    }
    newPath
  }

  /** All staged tables' CAS updates run in ONE database transaction: every
    * pointer flips or none does (reference TransactionalCatalog contract,
    * `catalog/multi_table_transaction.go:50-154`).
    */
  def commitTransaction(commits: Seq[StagedCommit]): Unit = {
    require(commits.map(_.name).distinct.size == commits.size,
      "duplicate table in multi-table transaction")
    // Stage incrementally and remove EVERY staged file on ANY failure —
    // staging midway, a DB error, or a lost CAS. The DB pointer never
    // advanced in those cases, so an orphaned create-no-replace file would
    // make all future commits of that table at that version conflict
    // permanently (retry/rebase cannot recover a poisoned version slot).
    val staged = scala.collection.mutable.ArrayBuffer.empty[(StagedCommit, String)]
    def cleanup(): Unit = staged.foreach { case (_, p) =>
      try { FileIO.delete(p); () } catch { case _: Exception => () }
    }
    try {
      commits.foreach(c =>
        staged += c -> stageMetadataFile(c.name, c.updated, c.expectedVersion))
      val ok = withConn { conn =>
        conn.setAutoCommit(false)
        try {
          val allWon = staged.forall { case (c, newPath) =>
            casUpdate(conn, c.name, c.expectedVersion, newPath) == 1
          }
          if (allWon) { conn.commit(); true } else { conn.rollback(); false }
        } catch { case e: Throwable => conn.rollback(); throw e }
      }
      if (!ok) throw new CommitConflict(
        "multi-table transaction lost a concurrent race; nothing was applied")
    } catch { case e: Throwable => cleanup(); throw e }
  }

  private def stageMetadataFile(name: String, updated: TableMetadata,
      expectedVersion: Int): String = {
    val path = metadataFile(name, expectedVersion + 1, updated.properties)
    // create-no-replace pre-filters two racers targeting the same version
    // before either reaches the database
    try FileIO.createNoReplace(path, graft.table.Locations.encodeMetadata(
      TableMetadata.toJson(updated), updated.properties))
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new CommitConflict(s"version ${expectedVersion + 1} already staged for $name")
    }
    path
  }

  private def casUpdate(c: Connection, name: String, expectedVersion: Int,
      newPath: String): Int = {
    val (ns, tbl) = split(name)
    // The expected CURRENT location is whatever the catalog row actually
    // holds (as long as its version number matches) — NOT a path derived
    // from the table name: renamed and registered tables keep their
    // metadata under the ORIGINAL directory (catalog identity != storage
    // location), and deriving the path from the name would make every
    // commit of such a table a phantom conflict. A racing commit between
    // this read and the UPDATE still loses: the conditional UPDATE matches
    // zero rows once the location moved.
    val sel = c.prepareStatement(
      """SELECT metadata_location FROM iceberg_tables
         WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?""")
    sel.setString(1, catalogName); sel.setString(2, ns); sel.setString(3, tbl)
    val rs = sel.executeQuery()
    val currentLoc = if (rs.next()) Option(rs.getString(1)) else None
    currentLoc.filter(loc => versionOf(loc).contains(expectedVersion)) match {
      case None => 0
      case Some(loc) =>
        val ps = c.prepareStatement(
          """UPDATE iceberg_tables
             SET metadata_location = ?, previous_metadata_location = ?
             WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?
               AND metadata_location = ?""")
        ps.setString(1, newPath); ps.setString(2, loc)
        ps.setString(3, catalogName); ps.setString(4, ns); ps.setString(5, tbl)
        ps.setString(6, loc)
        ps.executeUpdate()
    }
  }

  private def currentLocation(name: String): Option[String] = withConn { c =>
    val (ns, tbl) = split(name)
    val ps = c.prepareStatement(
      """SELECT metadata_location FROM iceberg_tables
         WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?""")
    ps.setString(1, catalogName); ps.setString(2, ns); ps.setString(3, tbl)
    val rs = ps.executeQuery()
    if (rs.next()) Option(rs.getString(1)) else None
  }

  private def isDuplicateKey(e: SQLException): Boolean =
    e.getSQLState == "23505" || // Derby/Postgres/H2 unique violation
      Option(e.getSQLState).exists(_.startsWith("23"))

  /** Atomic rename (reference `catalog/sql/sql.go:1096-1170` RenameTable):
    * nothing moves in storage — only the catalog row's identity changes,
    * inside one database transaction with the destination-absence and
    * source-existence checks. The metadata `location` keeps pointing at the
    * original table directory, exactly as in the reference: rename changes
    * the catalog identity, not where the data lives.
    */
  def renameTable(from: String, to: String): Table = {
    val (fns, ftbl) = split(from)
    val (tns, ttbl) = split(to)
    withConn { c =>
      c.setAutoCommit(false)
      try {
        // destination namespace must exist (reference sql.go RenameTable
        // checks it) — otherwise the renamed table lands invisible to
        // namespace-scoped listings. Probed INSIDE the transaction, with
        // listNamespaces' semantics (marker row or any table in it).
        val nsProbe = c.prepareStatement(
          """SELECT 1 FROM iceberg_namespace_properties
             WHERE catalog_name = ? AND namespace = ?
             UNION SELECT 1 FROM iceberg_tables
             WHERE catalog_name = ? AND table_namespace = ?""")
        nsProbe.setString(1, catalogName); nsProbe.setString(2, tns)
        nsProbe.setString(3, catalogName); nsProbe.setString(4, tns)
        if (!nsProbe.executeQuery().next())
          throw new NoSuchElementException(s"no such namespace: $tns")
        val probe = c.prepareStatement(
          """SELECT 1 FROM iceberg_tables
             WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?""")
        probe.setString(1, catalogName); probe.setString(2, tns); probe.setString(3, ttbl)
        if (probe.executeQuery().next())
          throw new IllegalArgumentException(s"table $to already exists")
        val up = c.prepareStatement(
          """UPDATE iceberg_tables SET table_namespace = ?, table_name = ?
             WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?""")
        up.setString(1, tns); up.setString(2, ttbl)
        up.setString(3, catalogName); up.setString(4, fns); up.setString(5, ftbl)
        if (up.executeUpdate() != 1)
          throw new IllegalArgumentException(s"no such table: $from")
        c.commit()
      } catch { case e: Throwable => c.rollback(); throw e }
    }
    loadTable(to)
  }

  /** Register an EXISTING metadata file under a new table name (reference
    * `catalog/rest/rest.go:1564-1610` RegisterTable, spec
    * `POST /v1/{prefix}/namespaces/{ns}/register`): no metadata rewrite —
    * the catalog row simply points at the given location. The file must
    * parse as table metadata; registering over an existing name fails.
    * Registering the same location under two names makes two independent
    * catalog pointers that share history up to now and diverge on their
    * next commits.
    */
  def registerTable(name: String, metadataLocation: String): Table = {
    // validate EVERYTHING the loaded Table will need BEFORE touching the
    // database: a post-insert failure (e.g. Table.currentVersion choking on
    // an unparseable filename) would leave a poisoned catalog row that
    // retries hit as 'already exists' and loadTable crashes on
    if (versionOf(metadataLocation).isEmpty)
      throw new IllegalArgumentException(
        s"unsupported metadata file name: $metadataLocation " +
          "(this catalog requires v<N>.metadata.json versioned locations)")
    val meta = TableMetadata.fromJson(
      graft.table.Locations.readMetadataJson(metadataLocation))
    val (ns, tbl) = split(name)
    if (!namespaceExists(ns) && !listNamespaces().contains(ns))
      throw new NoSuchElementException(s"no such namespace: $ns")
    val inserted = withConn { c =>
      val ps = c.prepareStatement(
        """INSERT INTO iceberg_tables (catalog_name, table_namespace, table_name,
           metadata_location, previous_metadata_location, iceberg_type)
           VALUES (?, ?, ?, ?, NULL, 'TABLE')""")
      ps.setString(1, catalogName); ps.setString(2, ns); ps.setString(3, tbl)
      ps.setString(4, metadataLocation)
      try { ps.executeUpdate(); true }
      catch { case e: SQLException if isDuplicateKey(e) => false }
    }
    if (!inserted)
      throw new IllegalArgumentException(s"table $name already exists")
    new Table(name, meta, metadataLocation, this)
  }

  // ---- namespaces (reference sql.go namespace-properties model) ----------

  /** The row marking namespace existence independent of its properties
    * (reference `sql.go:65` uses an encoded marker key the same way).
    */
  private val existsKey = "exists"

  def createNamespace(ns: String, props: Map[String, String] = Map.empty): Unit = {
    require(!namespaceExists(ns), s"namespace $ns already exists")
    setNamespaceProps(ns, props + (existsKey -> "true"))
  }

  def namespaceExists(ns: String): Boolean = loadNamespaceProperties(ns).nonEmpty

  def listNamespaces(): Seq[String] = withConn { c =>
    val ps = c.prepareStatement(
      """SELECT DISTINCT namespace FROM iceberg_namespace_properties
         WHERE catalog_name = ?
         UNION SELECT DISTINCT table_namespace FROM iceberg_tables
         WHERE catalog_name = ?""")
    ps.setString(1, catalogName); ps.setString(2, catalogName)
    val rs = ps.executeQuery()
    val out = Seq.newBuilder[String]
    while (rs.next()) out += rs.getString(1)
    out.result().sorted
  }

  def loadNamespaceProperties(ns: String): Map[String, String] = withConn { c =>
    val ps = c.prepareStatement(
      """SELECT property_key, property_value FROM iceberg_namespace_properties
         WHERE catalog_name = ? AND namespace = ?""")
    ps.setString(1, catalogName); ps.setString(2, ns)
    val rs = ps.executeQuery()
    val out = Map.newBuilder[String, String]
    while (rs.next()) out += rs.getString(1) -> rs.getString(2)
    out.result()
  }

  /** Remove then upsert, mirroring the reference's two-phase property
    * update; the marker row is never removable.
    */
  def updateNamespaceProperties(ns: String, removals: Set[String],
      updates: Map[String, String]): Unit = {
    require(namespaceExists(ns), s"no such namespace: $ns")
    val overlap = removals.intersect(updates.keySet)
    require(overlap.isEmpty, s"properties both removed and updated: $overlap")
    withConn { c =>
      c.setAutoCommit(false)
      try {
        val del = c.prepareStatement(
          """DELETE FROM iceberg_namespace_properties
             WHERE catalog_name = ? AND namespace = ? AND property_key = ?""")
        (removals - existsKey).foreach { k =>
          del.setString(1, catalogName); del.setString(2, ns); del.setString(3, k)
          del.addBatch()
        }
        del.executeBatch()
        upsertProps(c, ns, updates - existsKey)
        c.commit()
      } catch { case e: Throwable => c.rollback(); throw e }
    }
  }

  def dropNamespace(ns: String): Unit = {
    val inUse = listTables().exists(t => split(t)._1 == ns)
    require(!inUse, s"namespace $ns still contains tables")
    withConn { c =>
      val ps = c.prepareStatement(
        "DELETE FROM iceberg_namespace_properties WHERE catalog_name = ? AND namespace = ?")
      ps.setString(1, catalogName); ps.setString(2, ns)
      ps.executeUpdate()
    }
    ()
  }

  private def setNamespaceProps(ns: String, props: Map[String, String]): Unit =
    withConn { c =>
      c.setAutoCommit(false)
      try { upsertProps(c, ns, props); c.commit() }
      catch { case e: Throwable => c.rollback(); throw e }
    }

  private def upsertProps(c: Connection, ns: String,
      props: Map[String, String]): Unit = {
    val del = c.prepareStatement(
      """DELETE FROM iceberg_namespace_properties
         WHERE catalog_name = ? AND namespace = ? AND property_key = ?""")
    val ins = c.prepareStatement(
      """INSERT INTO iceberg_namespace_properties
         (catalog_name, namespace, property_key, property_value) VALUES (?, ?, ?, ?)""")
    props.foreach { case (k, v) =>
      del.setString(1, catalogName); del.setString(2, ns); del.setString(3, k)
      del.addBatch()
      ins.setString(1, catalogName); ins.setString(2, ns)
      ins.setString(3, k); ins.setString(4, v)
      ins.addBatch()
    }
    del.executeBatch()
    ins.executeBatch()
    ()
  }
}

object SqlCatalog {
  /** `sql:<jdbcUrl>|<warehousePath>` — the factory behind the `sql` scheme
    * in [[Catalogs]].
    */
  def fromUri(rest: String): SqlCatalog = {
    val i = rest.lastIndexOf('|')
    require(i > 0, s"sql catalog uri must be sql:<jdbcUrl>|<warehouse>, got $rest")
    new SqlCatalog(rest.substring(0, i), rest.substring(i + 1))
  }
}
