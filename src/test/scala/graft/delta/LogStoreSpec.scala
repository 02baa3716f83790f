package graft.delta

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** The put-if-absent seam behind DeltaLog.write: both built-in stores must
  * refuse a second publish of the same version and leave no tmp debris;
  * scheme resolution must allow deployments to plug object-store impls.
  * (The end-to-end concurrency properties — 8 racing writers, one winner
  * per version — are pinned in DeltaSpec over the same code path.) */
class LogStoreSpec extends AnyFunSuite {

  private def localFs: FileSystem = FileSystem.getLocal(new Configuration()).getRawFileSystem

  private def withTmpDir[A](f: Path => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("logstore")
    try f(new Path(dir.toString))
    finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  private def roundtrip(store: LogStore): Unit = withTmpDir { dir =>
    val fs = localFs
    val dest = new Path(dir, "00000000000000000007.json")
    store.writeAtomic(fs, dest, "first".getBytes(StandardCharsets.UTF_8), 7L)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dest.toUri.getPath)), StandardCharsets.UTF_8) === "first")
    val e = intercept[VersionAlreadyExists](
      store.writeAtomic(fs, dest, "second".getBytes(StandardCharsets.UTF_8), 7L))
    assert(e.version === 7L)
    // loser must not clobber the winner, and must clean its staging file
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dest.toUri.getPath)), StandardCharsets.UTF_8) === "first")
    assert(fs.listStatus(dir).map(_.getPath.getName).toSet === Set(dest.getName))
  }

  test("hard-link store: exclusive publish, loser cleaned up") {
    roundtrip(HardLinkLogStore)
  }

  test("exclusive-create store: exclusive publish") {
    roundtrip(ExclusiveCreateLogStore)
  }

  test("scheme registry: file→hard-link, hdfs→exclusive-create, object stores refuse unregistered") {
    assert(LogStore.forScheme("file") === HardLinkLogStore)
    assert(LogStore.forScheme(null) === HardLinkLogStore)
    assert(LogStore.forScheme("hdfs") === ExclusiveCreateLogStore)
    // object-store create(overwrite=false) is not atomic: writing without
    // a registered conditional-put impl must fail loudly, not lose commits
    Seq("s3a", "gs", "abfss").foreach { s =>
      val e = intercept[IllegalStateException](LogStore.forScheme(s))
      assert(e.getMessage.contains("conditional-put"), s)
    }
    object CondPut extends LogStore {
      override def writeAtomic(fs: FileSystem, dest: Path, bytes: Array[Byte], v: Long): Unit = ()
    }
    LogStore.register("OSS", CondPut) // case-insensitive; once registered, it wins
    assert(LogStore.forScheme("oss") === CondPut)
  }

  test("in-memory conditional-put store passes the shared exclusive-publish contract") {
    roundtrip(new InMemoryConditionalPutLogStore)
  }

  test("registered conditional-put store end-to-end: two writers race a version, loser retries to the next") {
    withTmpDir { dir =>
      // register for file:// so DeltaLog.commit's real write path routes
      // through the conditional-put seam (exactly what an S3 deployment
      // does for s3a://); restored in finally — the in-memory store is
      // itself a correct LogStore, so a concurrently-running suite that
      // commits during this window still commits safely
      LogStore.register("file", new InMemoryConditionalPutLogStore)
      try {
        import Actions._
        val conf = new Configuration()
        val schema = new org.apache.spark.sql.types.StructType().add("x", "long").json
        new DeltaLog(dir.toString, conf, None).commit(Seq(
          Action(protocol = Some(Protocol())),
          Action(metaData = Some(Metadata(id = "race-table", schemaString = schema)))))

        // two independent writers, barrier-released: both target version 1;
        // the conditional put lets exactly one win and DeltaLog's optimistic
        // loop retries the loser onto version 2 — the reference needed a
        // DynamoDB mutex for precisely this guarantee on S3
        val barrier = new java.util.concurrent.CyclicBarrier(2)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        try {
          val futures = (1 to 2).map { i =>
            pool.submit(new java.util.concurrent.Callable[Long] {
              override def call(): Long = {
                val writer = new DeltaLog(dir.toString, conf, None)
                barrier.await()
                writer.commit(Seq(Action(commitInfo =
                  Some(CommitInfo(i.toLong, s"WRITER-$i")))))
              }
            })
          }
          val versions = futures.map(_.get()).toSet
          assert(versions === Set(1L, 2L),
            s"both writers must land, on consecutive versions: $versions")
        } finally pool.shutdown()

        // the log is intact: both commits readable, no version skipped
        assert(new DeltaLog(dir.toString, conf, None).snapshot().version === 2L)
      } finally LogStore.register("file", HardLinkLogStore)
    }
  }
}
