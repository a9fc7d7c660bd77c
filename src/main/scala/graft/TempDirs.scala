package graft

import java.nio.file.{Files, Path}

/** Scratch directories for fixture-backed entries (q93 zip fixture,
  * q95 stream source/checkpoint, bench ingest) — created like
  * `Files.createTempDirectory` but deleted recursively at JVM exit,
  * so repeated Verify/Bench runs don't accumulate gigabytes in /tmp
  * (round-6 verdict, hygiene item). */
object TempDirs {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach { p =>
        try {
          Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(f => { val _ = f.toFile.delete() })
        } catch { case _: Throwable => () } // best effort at exit
      }
    }, "graft-tempdir-cleanup"))
  }

  /** Create a fresh scratch dir that self-deletes at JVM exit. */
  def scratch(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }
}
