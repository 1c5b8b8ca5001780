package graft.core

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Per-process temp locations for gates that must materialize real
  * files (Z-order layouts, IO round-trips, IVF persistence) and for the
  * harness' per-run warehouse dirs.
  *
  * Paths are keyed by pid, so two concurrent runs (Bench alongside
  * check.py, or two checkouts at different scale factors) can never
  * overwrite each other's artifacts mid-gate — the round-4 flake class.
  * Within one run the path is stable, preserving the
  * overwrite-in-place discipline that keeps re-runs idempotent (a
  * fresh dir per invocation would accumulate a table copy per gate
  * run). Every handed-out path is deleted recursively at JVM exit, so
  * /tmp accumulates nothing across runs either. */
object TempPaths {

  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  private lazy val hookOnce: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      registered.forEach(p => deleteRecursively(p))))

  /** Stable per-process gate artifact path: /tmp/graft_<name>_<pid>. */
  def gatePath(name: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_${name}_$pid"
    register(Paths.get(p))
    p
  }

  /** Register an externally-created dir (e.g. a per-run warehouse) for
    * recursive deletion at JVM exit. */
  def register(p: Path): Unit = {
    hookOnce
    registered.add(p)
  }

  /** [[register]], returning the path — for inline wrapping. */
  def registered(p: Path): Path = { register(p); p }

  def pid: Long = ProcessHandle.current().pid()

  /** Recursively clear a directory NOW (fresh-state-per-run for gate
    * serving tables that hold nested bucket subdirs — a flat
    * listFiles().delete() silently leaves non-empty subdirs behind). */
  def clearDir(path: String): Unit = deleteRecursively(Paths.get(path))

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      try Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      catch { case _: Exception => () } // exit-time best effort
    }
}
