package graft.sources

import scala.collection.mutable

/** JVM-exit cleanup for the engine's PID-keyed scratch directories
  * (warehouse, format mirrors, stream staging, media fixtures). PID keying
  * makes concurrent JVMs safe (ADVICE r9 #2) but removed the old fixed
  * paths' self-overwrite bound on disk use — without cleanup every run
  * leaks a fixture copy until /tmp fills. One shutdown hook deletes every
  * registered dir; registration is idempotent and thread-safe.
  *
  * Hook ORDERING (ADVICE r10 #4): raw `Runtime.addShutdownHook` hooks run
  * concurrently with Spark's own shutdown hooks, so the cleanup could
  * delete the registered `spark.sql.warehouse.dir` while Spark was still
  * flushing/stopping — a race that can leave partially-deleted dirs on
  * the exit path. The hook therefore registers through Hadoop's
  * `ShutdownHookManager` (the ordered manager Spark's own
  * `SparkShutdownHookManager` installs into, at priority
  * FileSystem.SHUTDOWN_HOOK_PRIORITY + 30 = 40) with priority 5 — below
  * both Spark's hook set (40) and the FileSystem close hook (10) — so
  * deletion runs strictly after Spark quiesces. Falls back to
  * `Runtime.addShutdownHook` only when the Hadoop classes are absent.
  *
  * Best-effort by design: a SIGKILL skips hooks, so stale `graft_*_<pid>`
  * dirs from killed runs are still possible — they're PID-stamped exactly
  * so an out-of-band janitor (or the next human) can identify them.
  */
object TempDirs {
  private val dirs = mutable.LinkedHashSet.empty[String]
  private def cleanup(): Unit =
    dirs.synchronized(dirs.toList).foreach { d =>
      try deleteRecursively(new java.io.File(d))
      catch { case _: Throwable => () } // exit path: never throw
    }
  private lazy val hook: Unit =
    try
      org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
        new Runnable { def run(): Unit = cleanup() }, 5)
    catch {
      case _: Throwable =>
        // the fallback can fail the same way (IllegalStateException when
        // shutdown is already in progress) — degrade to no cleanup rather
        // than let register() throw (ADVICE r11 #2)
        try Runtime.getRuntime.addShutdownHook(
          new Thread(() => cleanup(), "graft-tempdir-cleanup"))
        catch { case _: Throwable => () }
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
