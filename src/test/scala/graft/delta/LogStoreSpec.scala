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
}
