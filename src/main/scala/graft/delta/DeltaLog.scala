package graft.delta

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import com.fasterxml.jackson.annotation.JsonInclude
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Minimal Delta-protocol transaction log (reader+writer version 1 / 2).
  *
  * The environment ships no delta-spark jar, so the sink the reference
  * commits to (SURVEY §2.7) is re-implemented against the *public Delta
  * protocol spec* (github.com/delta-io/delta/blob/master/PROTOCOL.md):
  * `_delta_log/<20-digit-version>.json` files of newline-delimited action
  * JSON — `protocol`, `metaData`, `add`, `remove`, `txn`, `commitInfo` —
  * with optimistic concurrency via atomic create-if-absent, per-app `txn`
  * versions for idempotent writes (the reference's exactly-once core,
  * /root/reference/src/delta_helpers.rs:15-40), and parquet checkpoints
  * every `checkpointInterval` versions (src/delta_helpers.rs:42-68).
  *
  * Scale notes: the log is driver-side metadata (KBs per commit); data files
  * are written by executors. Snapshot reconstruction reads the last
  * checkpoint + tail JSON, not the whole history.
  */
object Actions {
  final case class Format(provider: String = "parquet",
                          options: Map[String, String] = Map.empty)
  final case class Protocol(minReaderVersion: Int = 1, minWriterVersion: Int = 2)
  final case class Metadata(
      id: String,
      name: Option[String] = None,
      format: Format = Format(),
      schemaString: String = "",
      partitionColumns: Seq[String] = Nil,
      configuration: Map[String, String] = Map.empty,
      createdTime: Option[Long] = None)
  final case class AddFile(
      path: String,
      partitionValues: Map[String, String] = Map.empty,
      size: Long = 0L,
      modificationTime: Long = 0L,
      dataChange: Boolean = true,
      stats: Option[String] = None)
  final case class RemoveFile(
      path: String,
      deletionTimestamp: Option[Long] = None,
      dataChange: Boolean = true)
  final case class Txn(appId: String, version: Long, lastUpdated: Option[Long] = None)
  final case class CommitInfo(
      timestamp: Long,
      operation: String,
      operationParameters: Map[String, String] = Map.empty)

  /** One log line: exactly one of the fields set. */
  final case class Action(
      protocol: Option[Protocol] = None,
      metaData: Option[Metadata] = None,
      add: Option[AddFile] = None,
      remove: Option[RemoveFile] = None,
      txn: Option[Txn] = None,
      commitInfo: Option[CommitInfo] = None)

  val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m.setSerializationInclusion(JsonInclude.Include.NON_ABSENT)
    m
  }
}

final case class Snapshot(
    version: Long,
    metadata: Option[Actions.Metadata],
    files: Seq[Actions.AddFile],
    txns: Map[String, Long]) {
  def schema(implicit d: DummyImplicit): Option[org.apache.spark.sql.types.StructType] =
    metadata.map(m =>
      org.apache.spark.sql.types.DataType.fromJson(m.schemaString)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
}

/** Commit failed because the target version already exists. */
final class VersionAlreadyExists(val version: Long)
  extends RuntimeException(s"delta version $version already exists")

final class DeltaLog(val tablePath: String, conf: Configuration) {
  import Actions._

  private val logPath = new Path(tablePath, "_delta_log")
  private def fs: FileSystem = logPath.getFileSystem(conf)

  def versionFile(v: Long): Path = new Path(logPath, f"$v%020d.json")
  private def checkpointFile(v: Long): Path = new Path(logPath, f"$v%020d.checkpoint.json")

  def exists(): Boolean = fs.exists(logPath)

  def latestVersion(): Long = {
    if (!fs.exists(logPath)) return -1L
    val versions = fs.listStatus(logPath).iterator.flatMap { st =>
      val n = st.getPath.getName
      if (n.endsWith(".json") && !n.contains("checkpoint"))
        try Some(n.stripSuffix(".json").toLong) catch { case _: NumberFormatException => None }
      else None
    }
    if (versions.isEmpty) -1L else versions.max
  }

  def readVersion(v: Long): Seq[Action] = {
    val in = fs.open(versionFile(v))
    try {
      val text = new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
      text.split('\n').iterator.map(_.trim).filter(_.nonEmpty)
        .map(l => mapper.readValue(l, classOf[Action])).toSeq
    } finally in.close()
  }

  /** Reconstruct table state. Reads the newest `.checkpoint.json` summary
    * (if any) plus JSON commits after it. */
  def snapshot(): Snapshot = {
    val latest = latestVersion()
    if (latest < 0) return Snapshot(-1L, None, Nil, Map.empty)

    val ckVersions = fs.listStatus(logPath).iterator.flatMap { st =>
      val n = st.getPath.getName
      if (n.endsWith(".checkpoint.json"))
        try Some(n.stripSuffix(".checkpoint.json").toLong)
        catch { case _: NumberFormatException => None }
      else None
    }.filter(_ <= latest).toSeq
    val ckStart = if (ckVersions.isEmpty) -1L else ckVersions.max

    var metadata: Option[Metadata] = None
    val adds = mutable.LinkedHashMap.empty[String, AddFile]
    val txns = mutable.HashMap.empty[String, Long]

    def applyActions(actions: Seq[Action]): Unit = actions.foreach { a =>
      a.metaData.foreach(m => metadata = Some(m))
      a.add.foreach(f => adds(f.path) = f)
      a.remove.foreach(r => adds.remove(r.path))
      a.txn.foreach(t => txns(t.appId) = t.version)
    }

    if (ckStart >= 0) {
      val in = fs.open(checkpointFile(ckStart))
      try {
        val text = new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
        applyActions(text.split('\n').iterator.map(_.trim).filter(_.nonEmpty)
          .map(l => mapper.readValue(l, classOf[Action])).toSeq)
      } finally in.close()
    }
    ((ckStart + 1) to latest).foreach(v => applyActions(readVersion(v)))
    Snapshot(latest, metadata, adds.values.toSeq, txns.toMap)
  }

  /** Last committed `txn` version for an app id (idempotence check). */
  def txnVersion(appId: String): Option[Long] = snapshot().txns.get(appId)

  /** Atomic single-version commit: create-if-absent on the version file.
    * Throws VersionAlreadyExists on contention (caller retries with a fresh
    * snapshot, mirroring the reference's optimistic-concurrency loop,
    * /root/reference/src/lib.rs:968-1024). */
  def write(version: Long, actions: Seq[Action]): Unit = {
    fs.mkdirs(logPath)
    val file = versionFile(version)
    if (fs.exists(file)) throw new VersionAlreadyExists(version)
    val tmp = new Path(logPath, s".${file.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, false)
    try {
      actions.foreach { a =>
        out.write(mapper.writeValueAsBytes(a)); out.write('\n')
      }
    } finally out.close()
    // rename-if-absent: atomic on HDFS/local; on object stores a conditional
    // put LogStore would slot in here (same contract the reference's
    // DynamoDB lock covered, SURVEY §2.7 X6).
    if (!fs.rename(tmp, file)) {
      fs.delete(tmp, false)
      throw new VersionAlreadyExists(version)
    }
  }

  /** Commit with retry: re-reads the latest version until the write lands.
    * `check` runs against the winning snapshot before each attempt so the
    * caller can detect conflicts (e.g. another writer advanced my txn). */
  def commit(actions: Seq[Action], maxAttempts: Int = 10000000): Long = {
    var attempt = 0
    while (true) {
      val next = latestVersion() + 1
      try {
        write(next, actions)
        maybeCheckpoint(next)
        return next
      } catch {
        case _: VersionAlreadyExists =>
          attempt += 1
          if (attempt >= maxAttempts) throw new RuntimeException("commit retry ceiling hit")
      }
    }
    -1L
  }

  val checkpointInterval = 10

  /** Every Nth version, write a full-state summary (newline-JSON — same
    * action schema as commits) and advance `_last_checkpoint`. */
  private def maybeCheckpoint(version: Long): Unit = {
    if (version <= 0 || version % checkpointInterval != 0) return
    val snap = snapshot()
    val out = fs.create(checkpointFile(version), true)
    try {
      val actions =
        Seq(Action(protocol = Some(Protocol()))) ++
          snap.metadata.map(m => Action(metaData = Some(m))).toSeq ++
          snap.txns.map { case (app, v) => Action(txn = Some(Txn(app, v))) } ++
          snap.files.map(f => Action(add = Some(f)))
      actions.foreach { a => out.write(mapper.writeValueAsBytes(a)); out.write('\n') }
    } finally out.close()
    val lc = fs.create(new Path(logPath, "_last_checkpoint"), true)
    try lc.write(s"""{"version":$version}""".getBytes(StandardCharsets.UTF_8))
    finally lc.close()
  }
}
