package graft

/** Per-invocation staging-dir tokens. PID alone collides when two
  * invocations of the same op overlap inside one JVM (e.g. parallel
  * test suites): both resolve the same staging dir and the first
  * finisher's cleanup deletes the other's staged parquet mid-read.
  * PID + a JVM-wide counter is unique per call while staying
  * process-scoped (leftover dirs from a crashed run are still
  * identifiable by PID).
  */
object Staging {
  private val counter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** A token unique per call within and across JVMs on one host. */
  def token(): String =
    s"${ProcessHandle.current().pid()}_${counter.incrementAndGet()}"
}
