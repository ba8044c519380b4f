package graft.sources

import scala.collection.mutable

/** JVM-exit cleanup for the engine's PID-keyed scratch directories
  * (warehouse, format mirrors, stream staging, media fixtures). PID keying
  * makes concurrent JVMs safe (ADVICE r9 #2) but removed the old fixed
  * paths' self-overwrite bound on disk use — without cleanup every run
  * leaks a fixture copy until /tmp fills. One shutdown hook deletes every
  * registered dir; registration is idempotent and thread-safe.
  *
  * Best-effort by design: a SIGKILL skips hooks, so stale `graft_*_<pid>`
  * dirs from killed runs are still possible — they're PID-stamped exactly
  * so an out-of-band janitor (or the next human) can identify them.
  */
object TempDirs {
  private val dirs = mutable.LinkedHashSet.empty[String]
  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.synchronized(dirs.toList).foreach { d =>
        try deleteRecursively(new java.io.File(d))
        catch { case _: Throwable => () } // exit path: never throw
      }
    }, "graft-tempdir-cleanup"))
  }

  /** Register `path` for deletion at JVM exit; returns it for chaining. */
  def register(path: String): String = {
    dirs.synchronized { dirs += path }
    hook
    path
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
  }
}
