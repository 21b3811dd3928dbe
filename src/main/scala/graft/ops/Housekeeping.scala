package graft.ops

import java.io.File

/** Shared reaper for the pid-scoped scratch state the memoized tiers
  * leave behind (tx-table roots, standing warehouse index tables, BPE
  * vocabulary artifacts): each lives under a name ending in
  * `_p<pid>`, keyed to a process id that never recurs, so anything
  * whose owning process is DEAD is garbage by construction. A LIVE
  * pid's state is never touched — concurrent Bench + Verify stay
  * isolated. Production persists all three tiers in real catalogs and
  * never builds them inside a query; this is purely shared-local-/tmp
  * hygiene, generalized from the tx-table reaper after review flagged
  * the other two tiers leaking the same way. */
object Housekeeping {

  /** Delete children of `parent` matching `prefix*_p<pid>` whose pid is
    * dead. Quiet on any IO trouble — reaping is best-effort. */
  def reapDeadPidDirs(parent: File, prefix: String): Unit = {
    val kids = Option(parent.listFiles((_, n) => n.startsWith(prefix)))
      .getOrElse(Array.empty[File])
    kids.foreach { d =>
      val tail = d.getName.reverse.takeWhile(_.isDigit).reverse
      val owned = d.getName.contains("_p") && tail.nonEmpty && tail.length < 9
      val alive = owned && ProcessHandle.of(tail.toLong).isPresent
      if (owned && !alive)
        org.apache.commons.io.FileUtils.deleteQuietly(d)
    }
  }
}
