package graft.catalog

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.hive.conf.HiveConf
import org.apache.hadoop.hive.metastore.{HiveMetaStoreClient, IMetaStoreClient}
import org.apache.hadoop.hive.metastore.api.{AlreadyExistsException, Database,
  FieldSchema, LockComponent, LockLevel, LockRequest, LockResponse, LockState,
  LockType, NoSuchObjectException, SerDeInfo, StorageDescriptor,
  Table => HmsTable}

import graft.core.{IcebergSchema, IcebergType, IcebergTypes, NestedField}
import graft.format._
import graft.io.FileIO
import graft.table.Table

/** Hive-metastore catalog (reference `catalog/hive/hive.go`): the CURRENT
  * metadata pointer lives in the HMS table's `metadata_location` parameter,
  * and commits are serialized by the metastore's EXCLUSIVE table lock —
  * Hive's primary concurrent-writer signal (`hive.go:560-575`,
  * `lock.go:52-150`). The commit sequence under the lock re-reads the table
  * so the expected-pointer check can never act on state a concurrent commit
  * changed while lock acquisition was waiting (`hive.go:446-447`,
  * `hive.go:577-640`):
  *
  *  1. acquire EXCLUSIVE TABLE lock (poll `checkLock` while WAITING);
  *  2. `get_table`, verify `metadata_location` still matches the commit's
  *     base version — mismatch = lost race = CommitConflict (retryable);
  *  3. write the new metadata file, `alter_table` flipping
  *     `metadata_location` and recording `previous_metadata_location` from
  *     the UNMODIFIED parameters (`schema.go:216-218` — a user property can
  *     never replace the real previous pointer);
  *  4. unlock (always, also on failure — an orphaned lock blocks every
  *     later committer until the metastore's timeout).
  *
  * HMS object shape follows the reference (`schema.go:140-172`): an
  * EXTERNAL_TABLE with `table_type=ICEBERG`, `EXTERNAL=TRUE`, the Iceberg
  * storage-handler SerDe triple, and the current schema mirrored as Hive
  * columns so plain HMS tooling can describe the table.
  *
  * Runs embedded (in-process HMS over Derby — Hive 2.x holds a single
  * static PersistenceManagerFactory, so one embedded metastore per JVM;
  * [[HiveCatalog.embedded]] caches accordingly) or against a remote
  * `thrift://` URI. Table names are `ns.table`; bare names map to
  * `default`.
  */
final class HiveCatalog(conf: HiveConf, warehouseRaw: String)
    extends Catalog {

  import HiveCatalog._

  private val warehouse: String = FileIO.canonical(warehouseRaw)

  override lazy val viewStore: Option[MetaObjects] =
    Some(new HmsViewStore(this, warehouse))

  // HiveMetaStoreClient is not thread-safe; every RPC synchronizes on it
  // INDIVIDUALLY (never across a poll loop, so a waiting lock acquirer
  // can't deadlock the holder's unlock)
  private val client: IMetaStoreClient = new HiveMetaStoreClient(conf)
  private[catalog] def rpc[A](f: IMetaStoreClient => A): A =
    client.synchronized(f(client))

  /** Test-only fault injector around the commit `alter_table` rpc: receives
    * the real rpc as a thunk and may run it then throw (lost response),
    * throw without running (failed before apply), or run tampering rpcs —
    * exercising all three reconciliation outcomes.
    */
  @volatile private[graft] var commitAlterHook: (() => Unit) => Unit = f => f()

  private[catalog] def split(name: String): (String, String) = {
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
      props: Map[String, String]): String =
    s"${tableDir(name)}/metadata/" +
      graft.table.Locations.metadataFileName(v, props)

  private def getHmsTable(name: String): Option[HmsTable] = {
    val (ns, tbl) = split(name)
    try Option(rpc(_.getTable(ns, tbl)))
    catch { case _: NoSuchObjectException => None }
  }

  private[catalog] def ensureDatabase(ns: String): Unit = {
    try { rpc(_.getDatabase(ns)); () }
    catch {
      case _: NoSuchObjectException =>
        val db = new Database(ns, "graft namespace", s"$warehouse/$ns",
          new java.util.HashMap[String, String]())
        try rpc(_.createDatabase(db))
        catch { case _: AlreadyExistsException => () }
    }
  }

  // ---- lock protocol (reference lock.go:52-150) ---------------------------

  /** EXCLUSIVE TABLE-level lock; WAITING responses poll `checkLock` with
    * doubling backoff until ACQUIRED or the deadline. A NOT_ACQUIRED or
    * timeout raises CommitConflict (retryable — lock contention IS the
    * concurrent-writer signal, `hive.go:562-566`).
    */
  private def acquireLock(ns: String, tbl: String): Long = {
    val comp = new LockComponent(LockType.EXCLUSIVE, LockLevel.TABLE, ns)
    comp.setTablename(tbl)
    comp.setOperationType(org.apache.hadoop.hive.metastore.api.DataOperationType.NO_TXN)
    val req = new LockRequest(java.util.List.of(comp),
      sys.props.getOrElse("user.name", "graft"),
      java.net.InetAddress.getLoopbackAddress.getHostName)
    var resp: LockResponse = rpc(_.lock(req))
    val deadline = System.nanoTime() + LockTimeoutMs * 1000000L
    var sleepMs = 50L
    while (resp.getState == LockState.WAITING && System.nanoTime() < deadline) {
      Thread.sleep(sleepMs)
      sleepMs = math.min(sleepMs * 2, 1000L)
      resp = rpc(_.checkLock(resp.getLockid))
    }
    if (resp.getState != LockState.ACQUIRED) {
      // a still-WAITING lock must be released or it queues behind forever
      try { rpc(_.unlock(resp.getLockid)); () } catch { case _: Exception => () }
      throw new CommitConflict(
        s"failed to acquire Hive lock for $ns.$tbl (state ${resp.getState})")
    }
    resp.getLockid
  }

  private def withTableLock[A](ns: String, tbl: String)(f: => A): A =
    withTableLocks(Seq((ns, tbl)))(f)

  /** Lock several identities — ALWAYS in deterministic (db, table) order so
    * two operations locking overlapping identity sets cannot deadlock
    * (reference `hive.go:507-515` acquireLocks). All locks release in the
    * finally, also on failure.
    */
  private def withTableLocks[A](idents: Seq[(String, String)])(f: => A): A = {
    val ordered = idents.distinct.sorted
    val lockIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      ordered.foreach { case (ns, tbl) => lockIds += acquireLock(ns, tbl) }
      f
    } finally {
      lockIds.reverse.foreach { id =>
        try { rpc(_.unlock(id)); () } catch { case _: Exception => () }
      }
    }
  }

  // ---- Catalog ------------------------------------------------------------

  def tableExists(name: String): Boolean =
    getHmsTable(name).exists(isIcebergTable)

  def listTables(): Seq[String] = {
    val dbs = rpc(_.getAllDatabases).asScala.toSeq
    dbs.flatMap { db =>
      val names = rpc(_.getAllTables(db)).asScala.toSeq
      if (names.isEmpty) Nil
      else rpc(_.getTableObjectsByName(db, names.asJava)).asScala
        .filter(isIcebergTable).map(t => join(db, t.getTableName))
    }.sorted
  }

  def createTable(name: String, schema: IcebergSchema, spec: PartitionSpec,
      sortOrder: SortOrder = SortOrder.Unsorted,
      properties: Map[String, String] = Map.empty): Table = {
    val (ns, tbl) = split(name)
    ensureDatabase(ns)
    if (tableExists(name))
      throw new IllegalArgumentException(s"table $name already exists")
    val meta = TableMetadata.empty(tableDir(name), schema, spec, sortOrder, properties)
    val path = metadataFile(name, 1, meta.properties)
    // create-no-replace: a duplicate create must refuse WITHOUT touching a
    // live table's v1 file (same defect class the conformance battery
    // caught in SqlCatalog)
    try FileIO.createNoReplace(path, graft.table.Locations.encodeMetadata(
      TableMetadata.toJson(meta), meta.properties))
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new IllegalArgumentException(s"table $name already exists")
    }
    val hmsTable = constructHmsTable(ns, tbl, tableDir(name), path,
      meta.schema, meta.properties)
    try rpc(_.createTable(hmsTable))
    catch {
      case _: AlreadyExistsException =>
        try { FileIO.delete(path); () } catch { case _: Exception => () }
        throw new IllegalArgumentException(s"table $name already exists")
    }
    new Table(name, meta, path, this)
  }

  def loadTable(name: String): Table = {
    val hms = getHmsTable(name).filter(isIcebergTable).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    val path = metadataLocationOf(hms).getOrElse(
      throw new IllegalStateException(s"table $name has no metadata_location"))
    val meta = TableMetadata.fromJson(graft.table.Locations.readMetadataJson(path))
    new Table(name, meta, path, this)
  }

  def dropTable(name: String): Unit = {
    val (ns, tbl) = split(name)
    // deleteData=false: metadata/data-file lifecycle is the engine's
    // (purge respects gc.enabled), never HMS's
    try rpc(_.dropTable(ns, tbl, false, true))
    catch { case _: NoSuchObjectException => () }
    FileIO.deleteTree(tableDir(name))
    ()
  }

  def currentVersion(name: String): Option[Int] =
    getHmsTable(name).flatMap(metadataLocationOf)
      .flatMap(graft.table.Locations.metadataVersionOf)

  def commit(name: String, base: TableMetadata, updated: TableMetadata,
      expectedVersion: Int): String =
    commit(name, base, updated, expectedVersion, expectedLocation = None)

  /** CAS commit under the metastore's exclusive table lock. The CAS compares
    * the full `metadata_location` STRING when the committer supplies its base
    * pointer (reference `hive.go:577-640` compares locations) — strictly
    * stronger than the version number: a same-version pointer swap via
    * register/manual edit is caught. Version compare is the fallback for
    * callers without a base pointer.
    *
    * Failure handling after the new metadata file is written (reference
    * `hive.go:612-615`): the file is NEVER deleted — if `alter_table` failed
    * after applying (lost response on a remote HMS), the pointer references
    * that file and deleting it would brick the table; an unreferenced file is
    * orphan-cleanup's job. Only a concurrent-drop (`NoSuchObjectException`)
    * maps to the retryable [[CommitConflict]]; any other alter failure is
    * commit-state-unknown and surfaces as non-retryable
    * [[CommitStateUnknown]].
    */
  override def commit(name: String, base: TableMetadata, updated: TableMetadata,
      expectedVersion: Int, expectedLocation: Option[String]): String = {
    val (ns, tbl) = split(name)
    withTableLock(ns, tbl) {
      // re-read AFTER acquiring the lock: the pointer may have moved while
      // this committer waited (reference hive.go:446-447)
      val hms = getHmsTable(name).filter(isIcebergTable).getOrElse(
        throw new CommitConflict(s"table $name disappeared during commit"))
      val currentLoc = metadataLocationOf(hms).getOrElse(
        throw new CommitConflict(s"table $name has no metadata_location"))
      // version numbers and deterministic vN paths collide across a
      // drop+recreate; uuids don't — check BEFORE the pointer comparisons
      requireSameIncarnation(name, base, Some(currentLoc))
      expectedLocation match {
        case Some(expected) =>
          if (FileIO.canonical(currentLoc) != FileIO.canonical(expected))
            throw new CommitConflict(
              s"metadata_location changed: expected $expected but found $currentLoc")
        case None =>
          val currentV =
            graft.table.Locations.metadataVersionOf(currentLoc).getOrElse(0)
          if (currentV != expectedVersion)
            throw new CommitConflict(
              s"expected version $expectedVersion but found $currentV")
      }
      val newPath = metadataFile(name, expectedVersion + 1, updated.properties)
      val newBytes = graft.table.Locations.encodeMetadata(
        TableMetadata.toJson(updated), updated.properties)
      try FileIO.createNoReplace(newPath, newBytes)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          // a leftover from a prior unknown-outcome attempt at this same
          // version: the CAS pre-check above (under the exclusive lock)
          // proved the pointer is still at the base, so this path is
          // UNREFERENCED — replacing it cannot invalidate a live pointer,
          // and a late-applying ghost alter that references it afterwards
          // lands on metadata describing the same base→v+1 transition
          FileIO.write(newPath, newBytes)
      }
      try {
        commitAlterHook(() => rpc(_.alter_table(ns, tbl,
          updateHmsTableForCommit(hms, base, updated, newPath, tableDir(name)))))
      } catch {
        case e: NoSuchObjectException =>
          throw new CommitConflict(s"table $name dropped during commit: ${e.getMessage}")
        case e: Exception =>
          // Reconcile before surfacing (the reference stops at surfacing,
          // hive.go:612-615 — this exceeds it in the safe direction): the
          // exclusive lock is STILL HELD, so a re-read observes a stable
          // pointer. Three outcomes:
          //   pointer == newPath    → the alter applied, response was lost
          //                           → the commit SUCCEEDED
          //   pointer == base       → the alter did not apply → retryable
          //                           (the staged file stays in place; a
          //                           retry at this version re-stages it)
          //   anything else / the re-read itself fails (dead channel)
          //                         → genuinely unknown
          val observed =
            try getHmsTable(name).filter(isIcebergTable).flatMap(metadataLocationOf)
            catch { case _: Exception => None }
          observed.map(FileIO.canonical) match {
            case Some(loc) if loc == FileIO.canonical(newPath) =>
              newPath
            case Some(loc) if loc == FileIO.canonical(currentLoc) =>
              throw new CommitConflict(
                s"alter_table failed for $name before applying " +
                  s"(pointer still at $currentLoc): ${e.getMessage}")
            case _ =>
              throw new CommitStateUnknown(
                s"alter_table failed for $name; state unknown — metadata file " +
                  s"$newPath left in place (orphan cleanup reclaims it if the " +
                  "pointer never moved)", e)
          }
      }
      newPath
    }
  }

  /** Lock-based rename (reference `hive.go:502-545`): both identities
    * locked in deterministic order, the pointer re-verified under the
    * locks, then `alter_table` moves the identity. Storage stays put —
    * catalog identity != data location.
    */
  def renameTable(from: String, to: String): Table = {
    val (fns, ftbl) = split(from)
    val (tns, ttbl) = split(to)
    ensureDatabase(tns)
    // pre-lock snapshot of the source pointer: re-verified under the locks
    // so a commit that raced the lock wait turns into a typed conflict, not
    // a silent rename of different table state (reference hive.go:498-545)
    val preLockLoc = getHmsTable(from).filter(isIcebergTable)
      .flatMap(metadataLocationOf).getOrElse(
        throw new IllegalArgumentException(s"no such table: $from"))
    withTableLocks(Seq((fns, ftbl), (tns, ttbl))) {
      if (getHmsTable(to).isDefined)
        throw new IllegalArgumentException(s"table $to already exists")
      val hms = getHmsTable(from).filter(isIcebergTable).getOrElse(
        throw new CommitConflict(s"source table $from disappeared during rename"))
      val lockedLoc = metadataLocationOf(hms).getOrElse(
        throw new CommitConflict(s"source table $from lost its metadata_location"))
      if (lockedLoc != preLockLoc)
        throw new CommitConflict(
          s"source table $from metadata location changed from $preLockLoc to $lockedLoc")
      val renamed = new HmsTable(hms)
      renamed.setDbName(tns)
      renamed.setTableName(ttbl)
      try rpc(_.alter_table(fns, ftbl, renamed))
      catch {
        case e: AlreadyExistsException =>
          throw new IllegalArgumentException(
            s"table $to already exists: ${e.getMessage}")
        case e: org.apache.hadoop.hive.metastore.api.InvalidOperationException
            if Option(e.getMessage).exists(_.toLowerCase.contains("already exists")) =>
          throw new IllegalArgumentException(
            s"table $to already exists: ${e.getMessage}")
      }
    }
    loadTable(to)
  }

  /** Register an existing metadata file under a new name (no rewrite; the
    * HMS row simply points at the given location).
    */
  def registerTable(name: String, metadataLocation: String): Table = {
    if (graft.table.Locations.metadataVersionOf(metadataLocation).isEmpty)
      throw new IllegalArgumentException(
        s"unsupported metadata file name: $metadataLocation " +
          "(this catalog requires v<N>.metadata.json versioned locations)")
    val meta = TableMetadata.fromJson(
      graft.table.Locations.readMetadataJson(metadataLocation))
    val (ns, tbl) = split(name)
    ensureDatabase(ns)
    val hmsTable = constructHmsTable(ns, tbl, meta.location, metadataLocation,
      meta.schema, meta.properties)
    try rpc(_.createTable(hmsTable))
    catch {
      case _: AlreadyExistsException =>
        throw new IllegalArgumentException(s"table $name already exists")
    }
    new Table(name, meta, metadataLocation, this)
  }

  // ---- namespaces ---------------------------------------------------------

  def createNamespace(ns: String, props: Map[String, String] = Map.empty): Unit = {
    val db = new Database(ns, "graft namespace", s"$warehouse/$ns",
      props.asJava)
    try rpc(_.createDatabase(db))
    catch {
      case _: AlreadyExistsException =>
        throw new IllegalArgumentException(s"namespace $ns already exists")
    }
  }

  def namespaceExists(ns: String): Boolean =
    try { rpc(_.getDatabase(ns)); true }
    catch { case _: NoSuchObjectException => false }

  def listNamespaces(): Seq[String] = rpc(_.getAllDatabases).asScala.toSeq.sorted

  def loadNamespaceProperties(ns: String): Map[String, String] =
    try rpc(_.getDatabase(ns)).getParameters.asScala.toMap
    catch { case _: NoSuchObjectException =>
      throw new NoSuchElementException(s"no such namespace: $ns") }

  def dropNamespace(ns: String): Unit = {
    val inUse = try rpc(_.getAllTables(ns)).asScala.nonEmpty
      catch { case _: NoSuchObjectException => false }
    require(!inUse, s"namespace $ns still contains tables")
    try rpc(_.dropDatabase(ns, false, true))
    catch { case _: NoSuchObjectException => () }
    ()
  }

  /** Raw HMS object parameters (tables AND view projections) — the shape
    * external HMS tooling sees; used by diagnostics and the conformance
    * battery.
    */
  /** Simulate an EXTERNAL pointer edit (HMS tooling / manual alter) by
    * flipping `metadata_location` without going through the commit
    * protocol — the conformance battery uses this to prove the
    * location-string CAS catches same-version swaps a version compare
    * cannot.
    */
  private[graft] def forceSetPointer(ns: String, tbl: String, loc: String): Unit = {
    val hms = rpc(_.getTable(ns, tbl))
    hms.getParameters.put(MetadataLocationKey, loc)
    rpc(_.alter_table(ns, tbl, hms))
  }

  def hmsParameters(ns: String, tbl: String): Option[Map[String, String]] =
    try Option(rpc(_.getTable(ns, tbl))).map(t =>
      Option(t.getParameters).map(_.asScala.toMap).getOrElse(Map.empty))
    catch { case _: NoSuchObjectException => None }

  def close(): Unit = client.synchronized(client.close())
}

/** Hive view store (reference `hive.go` view surface +
  * `schema.go:101-138` constructHiveViewTable): the versioned view
  * metadata files and their CAS live in storage (the [[MetaObjects]]
  * protocol, shared with every other backend), and each view is
  * PROJECTED into an HMS VIRTUAL_VIEW object — `table_type=ICEBERG_VIEW`,
  * `metadata_location` at the current versioned file,
  * `previous_metadata_location` from the unmodified parameters, the
  * generic Hive SerDe triple (not the Iceberg storage handler), and the
  * current SQL as ViewOriginalText — so plain HMS tooling lists and
  * describes the views exactly as the reference publishes them.
  */
final class HmsViewStore(hive: HiveCatalog, warehouse: String)
    extends MetaObjects(warehouse) {

  import HiveCatalog._
  import org.apache.hadoop.hive.metastore.api.{Table => HmsTable}

  private def currentFile(v: ViewMetadata): String =
    s"${viewDir(v.name)}/v${v.metadataSeq}.view.json"

  // view names split db.name exactly like tables ('ns.v' projects into
  // database ns, bare names into default) — a dotted name must never become
  // a literal dotted table name inside the default database
  private def viewObject(name: String): Option[HmsTable] = {
    val (ns, v) = hive.split(name)
    try Option(hive.rpc(_.getTable(ns, v)))
      .filter(t => Option(t.getParameters).exists(
        _.asScala.get(TableTypeKey).exists(_.equalsIgnoreCase("ICEBERG_VIEW"))))
    catch { case _: NoSuchObjectException => None }
  }

  private def hmsView(name: String, v: ViewMetadata,
      previous: Option[String]): HmsTable = {
    val (ns, vn) = hive.split(name)
    val params = new java.util.HashMap[String, String]()
    v.properties.foreach { case (k, pv) => if (pv.nonEmpty) params.put(k, pv) }
    params.remove(PreviousMetadataLocationKey)
    params.put(TableTypeKey, "ICEBERG_VIEW")
    params.put(MetadataLocationKey, currentFile(v))
    previous.foreach(params.put(PreviousMetadataLocationKey, _))
    params.put(ExternalKey, "TRUE")
    val t = new HmsTable()
    t.setDbName(ns)
    t.setTableName(vn)
    t.setTableType("VIRTUAL_VIEW")
    t.setViewOriginalText(v.currentVersion.sql)
    t.setViewExpandedText(v.currentVersion.sql)
    t.setParameters(params)
    val sd = new StorageDescriptor()
    sd.setCols(java.util.List.of())
    sd.setLocation(v.location)
    sd.setInputFormat("org.apache.hadoop.mapred.FileInputFormat")
    sd.setOutputFormat("org.apache.hadoop.mapred.FileOutputFormat")
    val serde = new SerDeInfo()
    serde.setSerializationLib("org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe")
    sd.setSerdeInfo(serde)
    t.setSd(sd)
    t
  }

  /** Upsert the HMS projection after a file-CAS mutation landed: create
    * when absent, alter (recording the previous pointer from the
    * unmodified parameters) when present.
    */
  private def project(name: String, v: ViewMetadata): Unit = {
    val (ns, vn) = hive.split(name)
    viewObject(name) match {
      case None =>
        hive.ensureDatabase(ns)
        try hive.rpc(_.createTable(hmsView(name, v, previous = None)))
        catch { case _: AlreadyExistsException =>
          throw new IllegalArgumentException(
            s"view $name collides with an existing HMS object") }
      case Some(existing) =>
        val prev = Option(existing.getParameters)
          .flatMap(p => p.asScala.get(MetadataLocationKey))
        hive.rpc(_.alter_table(ns, vn, hmsView(name, v, prev)))
    }
  }

  override def createViewVersioned(name: String, version: ViewVersion,
      properties: Map[String, String] = Map.empty): ViewMetadata = {
    // the HMS namespace is shared with tables: refuse a view over an
    // existing table/view name BEFORE the file CAS runs
    if (viewObject(name).isDefined || hive.tableExists(name))
      throw new IllegalArgumentException(s"view $name already exists")
    val v = super.createViewVersioned(name, version, properties)
    project(name, v)
    v
  }

  override def replaceViewVersioned(name: String, version: ViewVersion): ViewMetadata = {
    val v = super.replaceViewVersioned(name, version)
    project(name, v)
    v
  }

  override def updateViewProperties(name: String, set: Map[String, String],
      remove: Seq[String] = Nil): ViewMetadata = {
    val v = super.updateViewProperties(name, set, remove)
    project(name, v)
    v
  }

  override def renameView(from: String, to: String): ViewMetadata = {
    val v = super.renameView(from, to)
    project(to, v)
    val (fns, fvn) = hive.split(from)
    viewObject(from).foreach(_ =>
      hive.rpc(_.dropTable(fns, fvn, false, true)))
    v
  }

  override def dropView(name: String): Unit = {
    super.dropView(name)
    val (ns, vn) = hive.split(name)
    viewObject(name).foreach(_ =>
      hive.rpc(_.dropTable(ns, vn, false, true)))
  }
}

object HiveCatalog {

  /** Property keys on the HMS table object (reference `options.go:34-47`). */
  val TableTypeKey = "table_type"
  val TableTypeIceberg = "ICEBERG"
  val MetadataLocationKey = "metadata_location"
  val PreviousMetadataLocationKey = "previous_metadata_location"
  val ExternalKey = "EXTERNAL"
  val StorageHandlerKey = "storage_handler"
  val IcebergStorageHandler = "org.apache.iceberg.mr.hive.HiveIcebergStorageHandler"

  private val LockTimeoutMs = 30000L

  private[catalog] def isIcebergTable(t: HmsTable): Boolean =
    Option(t).flatMap(t => Option(t.getParameters)).toSeq
      .flatMap(_.asScala.get(TableTypeKey))
      .exists(_.equalsIgnoreCase(TableTypeIceberg))

  private[catalog] def metadataLocationOf(t: HmsTable): Option[String] =
    Option(t.getParameters).flatMap(_.asScala.get(MetadataLocationKey))

  /** Hive type string for an Iceberg type (reference `schema.go:54-89`;
    * Hive LanguageManual Types). Types Hive can't express degrade to
    * string/binary — the HMS columns are descriptive mirrors, never the
    * source of truth (that's the metadata JSON).
    */
  private[catalog] def toHiveType(t: IcebergType): String = t match {
    case IcebergTypes.BooleanT => "boolean"
    case IcebergTypes.IntT => "int"
    case IcebergTypes.LongT => "bigint"
    case IcebergTypes.FloatT => "float"
    case IcebergTypes.DoubleT => "double"
    case IcebergTypes.DateT => "date"
    case IcebergTypes.TimeT => "string" // Hive has no time type
    case IcebergTypes.TimestampT | IcebergTypes.TimestampTzT |
         IcebergTypes.TimestampNsT | IcebergTypes.TimestampTzNsT => "timestamp"
    case IcebergTypes.StringT => "string"
    case IcebergTypes.UuidT => "string"
    case IcebergTypes.BinaryT => "binary"
    case IcebergTypes.FixedT(len) => s"binary($len)"
    case IcebergTypes.DecimalT(p, s) => s"decimal($p,$s)"
    case IcebergTypes.StructT(fields) =>
      fields.map(f => s"${f.name}:${toHiveType(f.fieldType)}")
        .mkString("struct<", ",", ">")
    case IcebergTypes.ListT(_, et, _) => s"array<${toHiveType(et)}>"
    case IcebergTypes.MapT(_, kt, _, vt, _) =>
      s"map<${toHiveType(kt)},${toHiveType(vt)}>"
    case other => other.typeName // variant/unknown/geo: descriptive passthrough
  }

  private[catalog] def hiveColumns(schema: IcebergSchema): java.util.List[FieldSchema] =
    schema.fields.map { f: NestedField =>
      new FieldSchema(f.name, toHiveType(f.fieldType), f.doc.orNull)
    }.asJava

  private def icebergSd(location: String, schema: IcebergSchema): StorageDescriptor = {
    val sd = new StorageDescriptor()
    sd.setCols(hiveColumns(schema))
    sd.setLocation(location)
    sd.setInputFormat("org.apache.iceberg.mr.hive.HiveIcebergInputFormat")
    sd.setOutputFormat("org.apache.iceberg.mr.hive.HiveIcebergOutputFormat")
    val serde = new SerDeInfo()
    serde.setSerializationLib("org.apache.iceberg.mr.hive.HiveIcebergSerDe")
    sd.setSerdeInfo(serde)
    sd
  }

  private[catalog] def constructHmsTable(ns: String, tbl: String,
      location: String, metadataLocation: String, schema: IcebergSchema,
      props: Map[String, String]): HmsTable = {
    val params = new java.util.HashMap[String, String]()
    props.foreach { case (k, v) => if (v.nonEmpty) params.put(k, v) }
    params.remove(PreviousMetadataLocationKey)
    params.put(TableTypeKey, TableTypeIceberg)
    params.put(MetadataLocationKey, metadataLocation)
    params.put(ExternalKey, "TRUE")
    params.put(StorageHandlerKey, IcebergStorageHandler)
    val t = new HmsTable()
    t.setDbName(ns)
    t.setTableName(tbl)
    t.setTableType("EXTERNAL_TABLE")
    t.setParameters(params)
    t.setSd(icebergSd(location, schema))
    t
  }

  /** Updated HMS object for a commit (reference `schema.go:196-236`):
    * properties the PREVIOUS metadata owned are cleared before the staged
    * ones land (HMS has no ownership marker for user parameters), and
    * `previous_metadata_location` is read from the UNMODIFIED parameters so
    * a user property can never replace the real previous pointer.
    */
  private[catalog] def updateHmsTableForCommit(existing: HmsTable,
      base: TableMetadata, updated: TableMetadata, newMetadataLocation: String,
      location: String): HmsTable = {
    val t = new HmsTable(existing) // deep thrift copy
    val params = new java.util.HashMap[String, String](
      Option(existing.getParameters).getOrElse(new java.util.HashMap[String, String]()))
    base.properties.keys.foreach(params.remove)
    updated.properties.foreach { case (k, v) => if (v.nonEmpty) params.put(k, v) }
    params.remove(PreviousMetadataLocationKey)
    Option(existing.getParameters).flatMap(p => Option(p.get(MetadataLocationKey)))
      .foreach(old => params.put(PreviousMetadataLocationKey, old))
    params.put(TableTypeKey, TableTypeIceberg)
    params.put(MetadataLocationKey, newMetadataLocation)
    params.put(ExternalKey, "TRUE")
    params.put(StorageHandlerKey, IcebergStorageHandler)
    t.setParameters(params)
    t.setSd(icebergSd(location, updated.schema))
    t
  }

  // One embedded metastore per JVM: Hive 2.x ObjectStore holds a static
  // PersistenceManagerFactory, so a second Derby URL in the same JVM would
  // silently reuse the first database. The cache makes that explicit.
  private val embeddedCache =
    new java.util.concurrent.ConcurrentHashMap[String, HiveCatalog]()

  /** Embedded in-process metastore over Derby at `metastoreDir`, metadata
    * files under `warehouse`.
    */
  private def embeddedConf(metastoreDir: String, warehouse: String): HiveConf = {
    val conf = new HiveConf()
    conf.set("javax.jdo.option.ConnectionURL",
      s"jdbc:derby:;databaseName=$metastoreDir/metastore_db;create=true")
    conf.set("hive.metastore.uris", "")
    conf.set("hive.metastore.warehouse.dir", warehouse)
    conf.set("datanucleus.schema.autoCreateAll", "true")
    conf.set("hive.metastore.schema.verification", "false")
    // no pooling-jar dependency: TxnHandler accepts bonecp (absent from
    // the classpath), dbcp, hikaricp, or none — and DataNucleus reads the
    // same key ("None" spelling)
    conf.set("datanucleus.connectionPoolingType", "None")
    // the lock tables (HIVE_LOCKS etc.) live in the txn schema, which
    // plain datanucleus autoCreate does not cover
    try org.apache.hadoop.hive.metastore.txn.TxnDbUtil.prepDb(conf)
    catch { case _: Exception => () } // already prepped
    conf
  }

  def embedded(metastoreDir: String, warehouse: String): HiveCatalog =
    embeddedCache.computeIfAbsent(s"$metastoreDir|$warehouse", { _ =>
      new HiveCatalog(embeddedConf(metastoreDir, warehouse), warehouse)
    })

  /** Start an in-process HMS Thrift server over the embedded Derby store
    * and return its port — so the `thrift://` remote branch of [[fromUri]]
    * (a REAL wire round-trip: client thrift marshal → TThreadPoolServer →
    * handler) is exercisable without an external Hive deployment. The JVM's
    * single static PersistenceManagerFactory applies: handlers share the
    * first embedded Derby database, so run the server over the SAME
    * `metastoreDir` as any embedded catalog in this JVM. Daemon thread;
    * lives for the JVM.
    */
  private[graft] def startThriftServer(metastoreDir: String,
      warehouse: String): Int = {
    val conf = embeddedConf(metastoreDir, warehouse)
    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    val started = new java.util.concurrent.atomic.AtomicBoolean(false)
    val lock = new java.util.concurrent.locks.ReentrantLock()
    val cond = lock.newCondition()
    val t = new Thread(() =>
      try org.apache.hadoop.hive.metastore.HiveMetaStore.startMetaStore(
        port, org.apache.hadoop.hive.shims.ShimLoader.getHadoopThriftAuthBridge,
        conf, lock, cond, started)
      catch { case e: Throwable =>
        System.err.println(s"embedded HMS thrift server died: $e") },
      s"graft-hms-thrift-$port")
    t.setDaemon(true)
    t.start()
    lock.lock()
    try {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (!started.get && System.nanoTime() < deadline)
        cond.await(1, java.util.concurrent.TimeUnit.SECONDS)
    } finally lock.unlock()
    require(started.get, "embedded HMS thrift server failed to start")
    port
  }

  /** `hive:<metastoreDbDir>|<warehouse>` (embedded Derby) or
    * `hive:thrift://host:port|<warehouse>` (remote HMS) — the factory
    * behind the `hive` scheme in [[Catalogs]].
    */
  def fromUri(rest: String): HiveCatalog = {
    val i = rest.lastIndexOf('|')
    require(i > 0, s"hive catalog uri must be hive:<metastoreDirOrThriftUri>|<warehouse>, got $rest")
    val (store, wh) = (rest.substring(0, i), rest.substring(i + 1))
    if (store.startsWith("thrift://")) {
      val conf = new HiveConf()
      conf.set("hive.metastore.uris", store)
      new HiveCatalog(conf, wh)
    } else embedded(store, wh)
  }
}
