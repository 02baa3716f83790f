package graft

/** Throwaway directories for queries that exercise the real Delta write
  * path (ref_st1, ref_b1, flagship): removed recursively on JVM exit —
  * without this every Verify/Bench round leaked a full table copy in
  * /tmp until the disk filled. */
object Scratch {
  def dir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(p.toFile)
    }
    p.toString
  }
}
