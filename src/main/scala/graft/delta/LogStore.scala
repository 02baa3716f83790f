package graft.delta

import org.apache.hadoop.fs.{FileSystem, Path}

/** The single storage primitive a Delta writer needs: PUT-IF-ABSENT of a
  * fully-assembled commit file. Every concurrency property of the log
  * (optimistic retry, exactly-once txn skips, conflict re-check) reduces to
  * "two writers cannot both create version N" — this trait is that seam.
  *
  * The reference ships a DynamoDB mutex for exactly this hole on S3
  * (X6, /root/reference/README.adoc:224-237: S3 then had no atomic
  * create-if-absent). Spark deployments pick a store per URI scheme
  * instead, delta-io LogStore-style:
  *   - `file://` → [[HardLinkLogStore]] (POSIX link(2) is atomic-exclusive);
  *   - HDFS-likes → [[ExclusiveCreateLogStore]] (namenode atomic create);
  *   - object stores → register a conditional-put impl via
  *     [[LogStore.register]]: S3 `If-None-Match: *`, GCS
  *     `ifGenerationMatch=0`, ABFS `If-None-Match: *` — each is one HTTP
  *     header on the upload, and each must map the precondition-failed
  *     response to [[VersionAlreadyExists]]. No lock table needed on any
  *     current major object store.
  */
trait LogStore {
  /** Atomically publish `bytes` at `dest`; throws [[VersionAlreadyExists]]
    * (version parsed by the caller's naming scheme) when `dest` already
    * exists — including when a concurrent writer creates it mid-call. MUST
    * NOT leave a partial `dest` visible under any failure. */
  def writeAtomic(fs: FileSystem, dest: Path, bytes: Array[Byte], version: Long): Unit
}

/** Local filesystems: stage to a hidden tmp file, publish with an exclusive
  * hard link. True POSIX atomicity with no TOCTOU — unlike
  * exists-then-rename, which `File#renameTo` silently turns into replace. */
object HardLinkLogStore extends LogStore {
  override def writeAtomic(fs: FileSystem, dest: Path, bytes: Array[Byte], version: Long): Unit = {
    val dir = dest.getParent
    val tmp = new Path(dir, s".${dest.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, false)
    try out.write(bytes) finally out.close()
    val localTmp = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath)
    val localDst = java.nio.file.Paths.get(fs.makeQualified(dest).toUri.getPath)
    try java.nio.file.Files.createLink(localDst, localTmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        fs.delete(tmp, false)
        throw new VersionAlreadyExists(version)
    }
    fs.delete(tmp, false)
  }
}

/** Filesystems whose `create(path, overwrite = false)` is atomic at the
  * metadata service (HDFS namenode and compatibles). */
object ExclusiveCreateLogStore extends LogStore {
  override def writeAtomic(fs: FileSystem, dest: Path, bytes: Array[Byte], version: Long): Unit = {
    val out =
      try fs.create(dest, false)
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new VersionAlreadyExists(version)
      }
    try out.write(bytes) finally out.close()
  }
}

/** Conditional-put semantics without a cloud SDK: a process-local
  * concurrent key set plays the role of S3's `If-None-Match: *`
  * precondition — exactly one writer per destination wins the reservation
  * atomically; the winner then uploads with a BLIND overwrite, which is
  * safe because the reservation (like the server-side precondition on a
  * real object store) is the atomicity, not the create flag. A production
  * S3/GCS/ABFS store replaces the set membership with the HTTP
  * precondition header and maps 412 Precondition Failed to
  * [[VersionAlreadyExists]] — nothing else about the seam changes, which
  * is what registering THIS class via [[LogStore.register]] proves
  * end-to-end (LogStoreSpec's two-writer race).
  *
  * One instance models one bucket: reservations never expire, and
  * destinations published outside the instance are invisible to it
  * (callers start from an empty prefix, as a fresh Delta table does —
  * DeltaLog.write's exists() fast-path additionally screens pre-existing
  * version files). */
final class InMemoryConditionalPutLogStore extends LogStore {
  private val published = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  override def writeAtomic(fs: FileSystem, dest: Path, bytes: Array[Byte], version: Long): Unit = {
    val key = fs.makeQualified(dest).toString
    if (!published.add(key)) throw new VersionAlreadyExists(version)
    // stage-then-rename, NOT a direct create: on S3 the upload itself is
    // all-or-nothing, but this class runs over real FileSystems where a
    // failed create+write would leave a PARTIAL dest visible — and a
    // released reservation would then let the next committer mistake the
    // truncated file for a committed version. Publishing only a fully
    // written file keeps the release-on-failure path sound.
    val tmp = new Path(dest.getParent, s".${dest.getName}.${java.util.UUID.randomUUID()}.tmp")
    try {
      val out = fs.create(tmp, false)
      try out.write(bytes) finally out.close()
      if (!fs.rename(tmp, dest))
        throw new java.io.IOException(s"rename $tmp -> $dest failed")
    } catch {
      case e: Throwable =>
        fs.delete(tmp, false)
        published.remove(key)
        throw e
    }
  }
}

object LogStore {
  @volatile private var registry: Map[String, LogStore] =
    Map("file" -> HardLinkLogStore)

  /** Object-store schemes whose Hadoop `create(overwrite = false)` is NOT
    * atomic (existence checked at create(), blind PUT at close() — two
    * writers can both publish one version and silently lose a commit).
    * These refuse to write until a conditional-put store is registered:
    * failing loudly beats corrupting a log. */
  private val NonAtomicSchemes =
    Set("s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss", "cos")

  /** Plug a store for a URI scheme (e.g. "s3a" → a conditional-put impl).
    * Process-wide, like Hadoop's own FileSystem registry. */
  def register(scheme: String, store: LogStore): Unit = synchronized {
    registry += scheme.toLowerCase -> store
  }

  /** Store for a scheme. HDFS-style exclusive-create is the default for
    * unregistered filesystem schemes (correct wherever
    * create(overwrite=false) is atomic at a metadata service); known
    * object-store schemes THROW until a conditional-put impl is
    * registered. */
  def forScheme(scheme: String): LogStore = {
    val s = Option(scheme).getOrElse("file").toLowerCase
    registry.getOrElse(s,
      if (NonAtomicSchemes.contains(s))
        throw new IllegalStateException(
          s"no LogStore registered for object-store scheme '$s': its " +
            "create(overwrite=false) is not atomic and concurrent writers " +
            "could both publish one Delta version. Register a " +
            "conditional-put LogStore (S3 If-None-Match, GCS " +
            "ifGenerationMatch=0, ABFS If-None-Match) via LogStore.register")
      else ExclusiveCreateLogStore)
  }
}
