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

  /** Content stamp for a fixture path — a digest over the RECURSIVE
    * sorted child list's (relative name, mtime, length) triples, so it
    * works for Spark-written parquet DIRECTORIES too, where the
    * directory's own `length` is not content-derived and `mtime` has
    * coarse (1 s) granularity: an in-place regeneration within the
    * same second still changes the part-file names (UUID task ids) and
    * therefore the stamp. One shared freshness discipline for every
    * per-corpus session memo (BPE vocabulary, graph-ANN stride,
    * trained IVF centroids) — review r15. */
  def contentStamp(path: String): String = {
    val root = new File(path)
    def walk(f: File): Seq[String] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[File])
          .sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(s"${f.getAbsolutePath.stripPrefix(root.getAbsolutePath)}:" +
        s"${f.lastModified}:${f.length};")
    val md = java.security.MessageDigest.getInstance("MD5")
    walk(root).foreach(s => md.update(s.getBytes("UTF-8")))
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(md.digest())
  }

  /** A stable per-SESSION token (short UUID) for memo keys AND scratch
    * paths: `System.identityHashCode(spark)` is not unique across live
    * sessions — a collision (or a path keyed only on pid) would hand
    * one session state bound to another's, or let a second session in
    * the same JVM rewrite a directory out from under the first's
    * registered temp view (r18 advice on ensurePartsupp; the
    * [[GraphAnn]] memo discipline, now shared). WeakHashMap = identity
    * semantics (SparkSession does not override equals), entries
    * reclaimable with the session. */
  private val sessionIds =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]()
  def sessionToken(spark: org.apache.spark.sql.SparkSession): String =
    sessionIds.synchronized {
      sessionIds.computeIfAbsent(spark,
        _ => java.util.UUID.randomUUID().toString.take(8))
    }

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
