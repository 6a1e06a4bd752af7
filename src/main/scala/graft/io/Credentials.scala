package graft.io

import java.util.concurrent.ConcurrentHashMap

/** REST-vended storage credential scoped to an object-location prefix
  * (reference `catalog/rest/rest.go:180-185`): the catalog owns storage
  * access and hands plan- or table-scoped config (session tokens, SAS
  * tokens, ...) to readers, so executors can open data files without
  * holding long-lived storage identity of their own.
  */
final case class StorageCredential(prefix: String, config: Map[String, String])

object StorageCredential {

  /** Expiry keys recognized across stores (reference
    * `catalog/rest/vended_creds.go:38-44`). Values are epoch millis.
    */
  val ExpiryKeys: Seq[String] = Seq(
    "s3.session-token-expires-at-ms",
    "adls.sas-token-expires-at-ms",
    "gcs.oauth2.token-expires-at",
    "expiration-time")

  /** Best-matching credential for a location: longest-prefix match,
    * mirroring the reference (`vended_creds.go:49-65`) and the Java/Python
    * implementations. Both sides go through [[FileIO.canonical]] first so a
    * prefix vended as `scheme://` matches a location rendered `scheme:/p`.
    * No match resolves to empty config, and the caller falls back to
    * ambient storage identity.
    */
  def resolve(creds: Seq[StorageCredential], location: String): Map[String, String] = {
    val loc = FileIO.canonical(location)
    creds.filter(c => loc.startsWith(FileIO.canonical(c.prefix)))
      .sortBy(-_.prefix.length)
      .headOption.map(_.config).getOrElse(Map.empty)
  }

  def expiryOf(config: Map[String, String]): Option[Long] =
    ExpiryKeys.flatMap(k => config.get(k).flatMap(_.toLongOption).filter(_ > 0)).headOption
}

/** Lazily-checked credentials for one SCAN PLAN (reference `planScopedIO`,
  * `catalog/rest/scan_planning.go:305-345`): a plan's credentials cannot be
  * renewed — there is no per-plan credentials endpoint — so expiry is a
  * loud error at use, never a storage 403 the user has to diagnose
  * (`vended_creds.go` loadFS, fetchCreds == nil arms).
  */
final class PlanScopedCredentials(
    creds: Seq[StorageCredential],
    location: String,
    nowMs: () => Long = () => System.currentTimeMillis()) {

  def isEmpty: Boolean = creds.isEmpty

  /** Per-scan reader options for the plan's location. These travel as Spark
    * read options (folded into the scan's Hadoop configuration by Spark's
    * file sources), so credentials stay scoped to the one scan — two
    * concurrent scans with different vended credentials never collide in
    * session state.
    */
  def ioOptions(): Map[String, String] = {
    val resolved = StorageCredential.resolve(creds, location)
    StorageCredential.expiryOf(resolved).foreach { exp =>
      if (nowMs() > exp) throw new IllegalStateException(
        s"vended storage credentials for $location expired at ${java.time.Instant.ofEpochMilli(exp)}")
    }
    resolved
  }
}

/** Credentials for a TABLE's own IO (reference `vendedCredentialRefresher`,
  * `catalog/rest/vended_creds.go:88-160`): unlike plan credentials these can
  * be renewed through `GET .../tables/{t}/credentials`, so expiry triggers a
  * re-fetch instead of an error.
  */
final class TableCredentials(
    initial: Seq[StorageCredential],
    location: String,
    fetch: () => Seq[StorageCredential],
    nowMs: () => Long = () => System.currentTimeMillis()) {

  @volatile private var current: Seq[StorageCredential] = initial

  def ioOptions(): Map[String, String] = synchronized {
    val resolved = StorageCredential.resolve(current, location)
    val expired = StorageCredential.expiryOf(resolved).exists(nowMs() > _)
    if (!expired) resolved
    else {
      current = fetch()
      val fresh = StorageCredential.resolve(current, location)
      StorageCredential.expiryOf(fresh).foreach { exp =>
        if (nowMs() > exp) throw new IllegalStateException(
          s"re-fetched storage credentials for $location already expired at ${java.time.Instant.ofEpochMilli(exp)}")
      }
      fresh
    }
  }
}

/** In-process credential-gated storage: a `gated://` Hadoop FileSystem over
  * local disk that refuses every read unless the scan's Hadoop configuration
  * carries a token the "store" currently recognizes — the same
  * config-key-driven enforcement shape as S3A session credentials, minus the
  * network. This is the verification harness for credential vending (gate
  * i40): there is no real object store in the test environment, but the
  * *plumbing under test* — server vends, client resolves, options reach the
  * executor-side reader — is exactly what a real store needs.
  */
object GatedFileSystem {
  val Scheme = "gated"
  val TokenKey = "graft.gated.token"

  /** Hadoop/Spark reader options that make the scheme resolvable; callers
    * add the vended token on top.
    */
  val implOptions: Map[String, String] = Map(
    s"fs.$Scheme.impl" -> classOf[GatedFileSystem].getName,
    // Hadoop's FS cache keys on scheme+authority+ugi only — a cached
    // instance initialized WITH a token would leak access to readers that
    // never presented one
    s"fs.$Scheme.impl.disable.cache" -> "true")

  // the store's ACL: token -> expiry epoch ms
  private val issued = new ConcurrentHashMap[String, java.lang.Long]()

  def issueToken(ttlMs: Long): String = {
    val tok = java.util.UUID.randomUUID().toString.replace("-", "")
    issued.put(tok, System.currentTimeMillis() + ttlMs)
    tok
  }

  def revoke(token: String): Unit = { issued.remove(token); () }

  private[io] def valid(token: String): Boolean =
    Option(issued.get(token)).exists(_ > System.currentTimeMillis())
}

final class GatedFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  import org.apache.hadoop.fs.{FileStatus, Path}
  import org.apache.hadoop.fs.permission.FsPermission

  override def getScheme: String = GatedFileSystem.Scheme
  override def getUri: java.net.URI = java.net.URI.create(s"${GatedFileSystem.Scheme}:///")

  /** Accept any authority (object-store semantics: the authority names a
    * bucket/endpoint; this stand-in maps them all to local disk). The
    * default check would reject `gated://host/p` against the
    * authority-less FS URI.
    */
  override def checkPath(path: Path): Unit = {
    val scheme = path.toUri.getScheme
    if (scheme != null && scheme != GatedFileSystem.Scheme)
      throw new IllegalArgumentException(s"Wrong FS scheme: $path, expected ${GatedFileSystem.Scheme}")
  }

  private def check(): Unit = {
    val tok = getConf.get(GatedFileSystem.TokenKey)
    if (tok == null || !GatedFileSystem.valid(tok))
      throw new org.apache.hadoop.security.AccessControlException(
        s"gated storage denied: missing or expired credential (${GatedFileSystem.TokenKey})")
  }

  /** RawLocalFileSystem statuses load permissions LAZILY via `new
    * File(uri)`, which rejects any scheme but `file` — copy into a plain
    * FileStatus with permissions pre-resolved (an object-store-style FS has
    * no POSIX permissions anyway). `as` preserves the CALLER's path
    * spelling: re-qualifying against the authority-less FS URI would drop a
    * `gated://host/...` authority and make listings disagree with the
    * requested roots.
    */
  private def eager(st: FileStatus, as: Path): FileStatus = new FileStatus(
    st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
    st.getModificationTime, st.getAccessTime,
    if (st.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
    "graft", "graft", as)

  override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    check(); super.open(f, bufferSize)
  }
  override def listStatus(f: Path): Array[FileStatus] = {
    check()
    val qf = f.makeQualified(getUri, getWorkingDirectory)
    super.listStatus(f).map { st =>
      // listStatus(file) yields the file itself; listStatus(dir) children
      val p = if (st.getPath.toUri.getPath == qf.toUri.getPath) qf
        else new Path(qf, st.getPath.getName)
      eager(st, p)
    }
  }
  override def getFileStatus(f: Path): FileStatus = {
    check(); eager(super.getFileStatus(f), f.makeQualified(getUri, getWorkingDirectory))
  }
}
