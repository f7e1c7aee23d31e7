package graft

import java.nio.file.{Files, Path}

/** Per-JVM scratch space for registry queries that exercise sinks
  * (format roundtrips, partitioned writes, streaming sentinels, audit
  * runs). All scratch dirs live under ONE session root that a shutdown
  * hook deletes recursively, so repeated Verify/Bench runs leave no
  * litter in /tmp — previously each invocation created and abandoned
  * its own `Files.createTempDirectory`. */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(r)))
    r
  }

  /** A fresh scratch subdirectory; unique per call (sinks must not
    * collide across bench repetitions), removed with the root on exit. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  private def deleteRec(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRec(_)) finally s.close()
    }
    Files.deleteIfExists(p)
    ()
  }
}
