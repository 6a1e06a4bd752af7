package graft.io

import java.io.{InputStream, OutputStream}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}

/** Storage abstraction over `org.apache.hadoop.fs.FileSystem` (reference
  * `io/io.go:47-218` + `io/gocloud` backends): one code path for `file://`,
  * `hdfs://`, `s3a://`, ... Paths without a scheme resolve against
  * `fs.defaultFS`. Every metadata/data-artifact byte the engine moves outside
  * Spark's own readers/writers goes through here, so executors and the driver
  * see the same storage on a real cluster — local `java.io` would silently
  * scatter artifacts across executor disks.
  */
object FileIO {

  /** Hadoop config: defaults are right for file:/hdfs:; object-store creds
    * come from the environment/cluster config like any Hadoop app.
    */
  lazy val conf = new Configuration()

  private def p(path: String): Path = new Path(path)

  // vended storage credentials (reference `catalog/rest/vended_creds.go`):
  // prefix-scoped config overlays applied when building a FileSystem for a
  // matching path. Registered by whoever received the credentials (a REST
  // client after planScan, an executor from broadcast task state) — the
  // overlay is JVM-local by design, exactly like ambient Hadoop credentials.
  private val credOverlays =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  def registerCredentials(prefix: String, config: Map[String, String]): Unit = {
    credOverlays.put(prefix, config)
    ()
  }

  def unregisterCredentials(prefix: String): Unit = {
    credOverlays.remove(prefix)
    ()
  }

  private def overlayFor(path: String): Option[(String, Map[String, String])] = {
    if (credOverlays.isEmpty) return None
    import scala.jdk.CollectionConverters._
    // canonical spellings on both sides: a prefix registered as
    // `scheme://` must match a path rendered `scheme:/p`
    val cp = canonical(path)
    credOverlays.asScala.filter { case (pre, _) => cp.startsWith(canonical(pre)) }
      .toSeq.sortBy(-_._1.length).headOption
  }

  /** Hadoop configuration for a path: the shared base conf, or a copy
    * carrying the longest-prefix vended-credential overlay when one is
    * registered. Footer readers and other direct Hadoop users go through
    * this so vended credentials apply everywhere FileIO's own ops do.
    */
  def confFor(path: String): Configuration = overlayFor(path) match {
    case None => conf
    case Some((_, cfg)) =>
      val copy = new Configuration(conf)
      cfg.foreach { case (k, v) => copy.set(k, v) }
      copy
  }

  // private instances (not the JVM-shared FileSystem cache) so we can turn
  // off client-side .crc sibling files — they double the small-file op count
  // on every manifest/puffin write — without affecting Spark's own IO
  private val fsCache =
    new java.util.concurrent.ConcurrentHashMap[String, FileSystem]()
  def fs(path: String): FileSystem = {
    val uri = p(path).toUri
    val overlay = overlayFor(path)
    // cache key carries the overlay's identity so re-vended (refreshed)
    // credentials build a fresh FileSystem instead of reviving a stale one
    val key = s"${Option(uri.getScheme).getOrElse("default")}://${Option(uri.getAuthority).getOrElse("")}" +
      overlay.map { case (pre, cfg) => s"#$pre#${cfg.hashCode}" }.getOrElse("")
    fsCache.computeIfAbsent(key, { _ =>
      val f = FileSystem.newInstance(uri, confFor(path))
      f.setWriteChecksum(false)
      f.setVerifyChecksum(false)
      f
    })
  }

  /** `file:`-scheme URIs and plain absolute paths name the same storage;
    * fold them to one spelling so path equality holds everywhere paths are
    * compared (delete↔data matching, DV keys, Spark's `_metadata.file_path`
    * normalization). For other schemes the empty-authority renderings
    * `scheme:///p` and `scheme:/p` also name the same object (Hadoop Path
    * prints the single-slash form, URI concatenation produces the triple) —
    * fold to single-slash. URIs with a real authority (`s3a://bucket/p`)
    * pass through untouched: the authority is part of the name.
    */
  def canonical(path: String): String =
    if (path.startsWith("file:")) "/" + path.stripPrefix("file:").dropWhile(_ == '/')
    else path.replaceFirst("^([A-Za-z][A-Za-z0-9+.-]*):(///+|//$)", "$1:/")

  def exists(path: String): Boolean = fs(path).exists(p(path))

  def size(path: String): Long = fs(path).getFileStatus(p(path)).getLen

  def mtime(path: String): Long = fs(path).getFileStatus(p(path)).getModificationTime

  def open(path: String): FSDataInputStream = fs(path).open(p(path))

  def readAllBytes(path: String): Array[Byte] = {
    val in = open(path)
    try {
      val len = size(path)
      require(len <= Int.MaxValue, s"file too large to slurp: $path ($len)")
      val buf = new Array[Byte](len.toInt)
      in.readFully(0L, buf)
      buf
    } finally in.close()
  }

  def readString(path: String): String =
    new String(readAllBytes(path), StandardCharsets.UTF_8)

  /** Positioned range read (DV blobs, puffin footers). */
  def readRange(path: String, offset: Long, length: Int): Array[Byte] = {
    val in = open(path)
    try {
      val buf = new Array[Byte](length)
      in.readFully(offset, buf)
      buf
    } finally in.close()
  }

  /** Create (overwrite) with implicit parent mkdirs — Hadoop semantics. */
  def create(path: String): OutputStream = fs(path).create(p(path), true)

  def write(path: String, bytes: Array[Byte]): Unit = {
    val out = create(path)
    try out.write(bytes) finally out.close()
  }

  def writeString(path: String, s: String): Unit =
    write(path, s.getBytes(StandardCharsets.UTF_8))

  /** Atomic create-no-replace: exactly one of two racing writers wins; the
    * loser gets FileAlreadyExistsException. This is the CAS primitive behind
    * optimistic catalog commits. On the local scheme a hard link provides
    * true atomicity (POSIX `link(2)`; Hadoop's RawLocalFileSystem rename
    * silently replaces, so it can't CAS); elsewhere Hadoop's
    * `create(overwrite=false)` is atomic on HDFS and conditional-put-backed
    * on modern object stores.
    */
  def createNoReplace(path: String, bytes: Array[Byte]): Unit = {
    val canon = canonical(path)
    // decide local-vs-remote by the RESOLVED filesystem, not by string
    // inspection: a scheme-less path with fs.defaultFS=hdfs:// must CAS on
    // HDFS, or the commit protocol silently splits across two filesystems
    val resolved = fs(canon)
    val isLocal = resolved.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      resolved.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem] ||
      resolved.getUri.getScheme == "file"
    if (isLocal) {
      val target = java.nio.file.Paths.get(
        if (canon.contains(":/")) p(canon).toUri.getPath else canon)
      java.nio.file.Files.createDirectories(target.getParent)
      val tmp = target.getParent.resolve(s".${target.getFileName}.${java.util.UUID.randomUUID()}.tmp")
      java.nio.file.Files.write(tmp, bytes)
      try java.nio.file.Files.createLink(target, tmp)
      finally { java.nio.file.Files.deleteIfExists(tmp); () }
    } else {
      val out = fs(path).create(p(path), false)
      try out.write(bytes) finally out.close()
    }
  }

  /** Atomic whole-file replace (advisory files like version hints): write a
    * temp sibling, then rename over the target. Readers never observe a
    * torn/empty file on FS backends with atomic rename.
    */
  def replaceAtomic(path: String, bytes: Array[Byte]): Unit = {
    val f = fs(path)
    val target = p(path)
    val tmp = new Path(target.getParent, s".${target.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (!f.rename(tmp, target)) {
      // rename-no-replace backends (HDFS): delete then rename
      f.delete(target, false)
      if (!f.rename(tmp, target))
        throw new java.io.IOException(s"cannot replace $path")
    }
  }

  def delete(path: String): Boolean = fs(path).delete(p(path), false)

  def deleteTree(path: String): Boolean = fs(path).delete(p(path), true)

  /** Parallel batch delete (reference `table/orphan_cleanup.go` worker pool):
    * per-file RPCs dominate expiry/orphan cleanup on remote stores, so they
    * run on a bounded pool instead of a driver-serial loop.
    */
  def deleteAll(paths: Seq[String], parallelism: Int = 16): Unit = {
    if (paths.isEmpty) return
    import scala.collection.parallel.CollectionConverters._
    val par = paths.par
    par.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(
      new java.util.concurrent.ForkJoinPool(math.min(parallelism, paths.size)))
    try par.foreach { path => fs(path).delete(p(path), false); () }
    finally par.tasksupport.environment.asInstanceOf[java.util.concurrent.ForkJoinPool].shutdown()
  }

  def mkdirs(path: String): Unit = { fs(path).mkdirs(p(path)); () }

  /** Move src to dst, creating dst's parent. Not create-no-replace. */
  def move(src: String, dst: String): Unit = {
    val f = fs(dst)
    f.mkdirs(p(dst).getParent)
    if (!f.rename(p(src), p(dst)))
      throw new java.io.IOException(s"cannot move $src -> $dst")
  }

  final case class FileInfo(path: String, size: Long, mtime: Long)

  /** Recursive file listing (no directories). Missing roots list empty. */
  def listFilesRecursive(dir: String): Seq[FileInfo] = {
    val f = fs(dir)
    val root = p(dir)
    if (!f.exists(root)) return Nil
    val it = f.listFiles(root, true)
    val buf = Seq.newBuilder[FileInfo]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile)
        buf += FileInfo(canonical(st.getPath.toString), st.getLen, st.getModificationTime)
    }
    buf.result()
  }

  /** Immediate child directory names of `dir` (catalog listings). */
  def listDirNames(dir: String): Seq[String] = {
    val f = fs(dir)
    val root = p(dir)
    if (!f.exists(root)) return Nil
    f.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  /** Avro needs a SeekableInput; adapt FSDataInputStream. */
  final class SeekableHadoopInput(path: String)
      extends org.apache.avro.file.SeekableInput {
    private val in = open(path)
    private val len = size(path)
    def read(b: Array[Byte], off: Int, l: Int): Int = in.read(b, off, l)
    def seek(pos: Long): Unit = in.seek(pos)
    def tell(): Long = in.getPos
    def length(): Long = len
    def close(): Unit = in.close()
  }
}
