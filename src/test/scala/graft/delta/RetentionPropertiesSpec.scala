package graft.delta

import org.apache.hadoop.fs.Path
import graft.SparkSpec

/** Cadence/retention table properties (delta-spark's):
  * `delta.checkpointInterval` drives checkpoint cadence,
  * `delta.logRetentionDuration` + `delta.enableExpiredLogCleanup` drive
  * checkpoint-time log expiry, and `delta.deletedFileRetentionDuration`
  * is VACUUM's default tombstone retention. */
class RetentionPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def logNames(table: String): Seq[String] = {
    val fs = fsOf(table)
    val dir = new Path(table, "_delta_log")
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).map(_.getPath.getName).toSeq.sorted
  }

  private def mk(prefix: String, conf: Map[String, String]): DeltaTable =
    DeltaTable.forPath(spark, tmpDir(prefix))
      .create(Seq((0L, "x")).toDF("id", "v").schema, configuration = conf)

  test("delta.checkpointInterval=3 checkpoints at v3 (default tables do not)") {
    val t = mk("ret-ckint", Map(DeltaTable.CheckpointIntervalKey -> "3"))
    (0 until 3).foreach(i =>
      t.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    assert(logNames(t.path).exists(n =>
      n.contains("checkpoint") && n.startsWith("%020d".format(3))),
      s"expected a v3 checkpoint, got ${logNames(t.path)}")

    val d = mk("ret-ckdef", Map.empty)
    (0 until 3).foreach(i =>
      d.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    assert(!logNames(d.path).exists(_.contains("checkpoint")),
      "default cadence is 10 — three commits must not checkpoint")
  }

  test("logRetentionDuration 0 expires pre-checkpoint JSON at checkpoint time") {
    val t = mk("ret-expire", Map(
      DeltaTable.CheckpointIntervalKey -> "3",
      DeltaTable.LogRetentionKey -> "interval 0 hours"))
    (0 until 3).foreach(i =>
      t.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val names = logNames(t.path)
    assert(!names.contains("%020d.json".format(0)) &&
      !names.contains("%020d.json".format(2)),
      s"commits below the v3 checkpoint must expire, got $names")
    assert(names.contains("%020d.json".format(3)), "the checkpoint version's JSON survives")
    // the table stays fully readable from the surviving checkpoint
    val t2 = DeltaTable.forPath(spark, t.path)
    assert(t2.toDF.count() === 3L)
    assert(t2.log.snapshotAt(3).files.nonEmpty)
    // history below the cutoff is gone — the documented trade
    intercept[Exception](t2.log.snapshotAt(1))
  }

  test("enableExpiredLogCleanup=false keeps expired JSON") {
    val t = mk("ret-keep", Map(
      DeltaTable.CheckpointIntervalKey -> "3",
      DeltaTable.LogRetentionKey -> "interval 0 hours",
      DeltaTable.ExpiredLogCleanupKey -> "false"))
    (0 until 3).foreach(i =>
      t.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val names = logNames(t.path)
    assert(names.contains("%020d.json".format(0)),
      s"cleanup disabled: every commit JSON survives, got $names")
    assert(t.log.snapshotAt(1).files.size === 1)
  }

  test("VACUUM defaults to delta.deletedFileRetentionDuration") {
    import org.apache.spark.sql.functions._
    val t = mk("ret-vac", Map(
      DeltaTable.DeletedFileRetentionKey -> "interval 0 seconds"))
    t.append((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    assert(t.delete(col("id") >= 0L) > 0L) // tombstones every data file
    Thread.sleep(5) // mtime strictly below the zero-retention cutoff
    val candidates = t.vacuumDryRun() // no arg → property (0 s)
    assert(candidates.nonEmpty, "zero-retention property must expose the tombstoned file")
    assert(t.vacuum() === candidates.size)

    // without the property, the no-arg default stays delta's 7 days
    val d = mk("ret-vacdef", Map.empty)
    d.append((0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    assert(d.delete(col("id") >= 0L) > 0L)
    assert(d.vacuumDryRun().isEmpty, "7-day default must keep a fresh tombstone")
  }

  test("setTransactionRetentionDuration expires idle app txns at checkpoint time") {
    val t = mk("ret-txn", Map(
      DeltaTable.CheckpointIntervalKey -> "2",
      DeltaTable.TxnRetentionKey -> "interval 0 milliseconds"))
    t.append(Seq((1L, "a")).toDF("id", "v"), txnAppId = Some("app-x"), txnVersion = 7L)
    // every committed txn action carries a lastUpdated stamp
    assert(t.log.readVersion(1L).flatMap(_.txn).exists(_.lastUpdated.isDefined))
    Thread.sleep(5)
    t.append(Seq((2L, "b")).toDF("id", "v")) // v2 → checkpoint drops the entry
    t.log.cleanupMetadata(2L) // fresh readers must seed from the checkpoint
    val fresh = DeltaTable.forPath(spark, t.path)
    assert(fresh.snapshot.txns.get("app-x").isEmpty,
      "zero retention: the idle app's txn must not survive the checkpoint")
    // the documented trade: the idempotence window is closed — the same
    // (appId, version) applies again
    assert(fresh.append(Seq((3L, "c")).toDF("id", "v"),
      txnAppId = Some("app-x"), txnVersion = 7L) > 0L)

    // without the property the txn survives checkpoint + cleanup and dedups
    val d = mk("ret-txnkeep", Map(DeltaTable.CheckpointIntervalKey -> "2"))
    d.append(Seq((1L, "a")).toDF("id", "v"), txnAppId = Some("app-y"), txnVersion = 7L)
    d.append(Seq((2L, "b")).toDF("id", "v"))
    d.log.cleanupMetadata(2L)
    val freshD = DeltaTable.forPath(spark, d.path)
    assert(freshD.snapshot.txns.get("app-y").contains(7L))
    assert(freshD.append(Seq((3L, "c")).toDF("id", "v"),
      txnAppId = Some("app-y"), txnVersion = 7L) === -1L)
  }

  test("duration parsing: units, optional keyword, malformed refusals at SET time") {
    assert(DeltaTable.parseIntervalMs("interval 2 weeks") === 14L * 24 * 3600 * 1000)
    assert(DeltaTable.parseIntervalMs("interval 1 day") === 24L * 3600 * 1000)
    assert(DeltaTable.parseIntervalMs("168 hours") === 7L * 24 * 3600 * 1000)
    assert(DeltaTable.parseIntervalMs("90 Minutes") === 90L * 60 * 1000)
    assert(DeltaTable.parseIntervalMs("interval 0 seconds") === 0L)
    // delta-spark's multi-unit CalendarInterval form: terms sum
    assert(DeltaTable.parseIntervalMs("interval 1 days 12 hours")
      === 36L * 3600 * 1000)
    assert(DeltaTable.parseIntervalMs("2 weeks 1 day") === 15L * 24 * 3600 * 1000)
    intercept[IllegalArgumentException](DeltaTable.parseIntervalMs("7d"))
    intercept[IllegalArgumentException](
      DeltaTable.parseIntervalMs("interval 1 day and 2 hours"))
    // the lenient twin (post-commit paths) never throws
    assert(DeltaTable.parseIntervalMsLenient("interval 1 day") === Some(24L * 3600 * 1000))
    assert(DeltaTable.parseIntervalMsLenient("gibberish").isEmpty)
    val t = mk("ret-badset", Map.empty)
    t.append(Seq((1L, "a")).toDF("id", "v"))
    intercept[IllegalArgumentException](
      t.setProperties(Map(DeltaTable.LogRetentionKey -> "soon")))
    intercept[IllegalArgumentException](
      t.setProperties(Map(DeltaTable.CheckpointIntervalKey -> "0")))
    // well-formed values set fine and drive the next checkpoint
    t.setProperties(Map(DeltaTable.CheckpointIntervalKey -> "3"))
    t.append(Seq((2L, "b")).toDF("id", "v")) // v3 with the property live
    assert(logNames(t.path).exists(n =>
      n.contains("checkpoint") && n.startsWith("%020d".format(3))))
  }
}
