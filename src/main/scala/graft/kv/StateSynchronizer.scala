package graft.kv

import graft.core.ConditionalCheckFailedException
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.io.FileNotFoundException
import java.nio.charset.StandardCharsets

/** Optimistically-replicated shared state
  * (client/.../state/StateSynchronizer.java:44 over
  * RevisionedStreamClient.java:29 `writeConditionally`): state lives as one
  * revision file per version; an update reads the latest revision, applies
  * a function, and commits the next revision with create-if-absent
  * semantics — the exact CAS-at-offset behavior of a revisioned stream,
  * with the revision number standing in for the stream offset.
  *
  * Driver-side by design: this is coordination metadata (reader-group
  * state, app config), never bulk data.
  */
class StateSynchronizer(rootDir: String, name: String,
                        hadoopConf: Configuration = new Configuration()) {

  private val dir = new Path(new Path(rootDir), s"_state/$name")
  private def fs: FileSystem = dir.getFileSystem(hadoopConf)
  private def revPath(r: Long) = new Path(dir, f"rev-$r%012d")

  /** Latest (revision, state); revision -1 = no state yet. */
  def fetch(): (Long, Option[String]) = {
    val revs =
      try fs.listStatus(dir).iterator.map(_.getPath.getName)
        .collect { case n if n.startsWith("rev-") => n.stripPrefix("rev-").toLong }.toSeq
      catch { case _: FileNotFoundException => Seq.empty[Long] }
    if (revs.isEmpty) (-1L, None)
    else {
      val r = revs.max
      val in = fs.open(revPath(r))
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 8192, false)
        (r, Some(new String(bytes.toByteArray, StandardCharsets.UTF_8)))
      } finally in.close()
    }
  }

  /** writeConditionally (RevisionedStreamClient.java:78): commit `state` as
    * `expectedRevision + 1`; loses → ConditionalCheckFailed.
    */
  def writeConditionally(expectedRevision: Long, state: String): Long = {
    fs.mkdirs(dir)
    val next = expectedRevision + 1
    try {
      val out = graft.catalog.CasFiles.createExclusive(fs, revPath(next))
      try out.write(state.getBytes(StandardCharsets.UTF_8)) finally out.close()
      next
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException | _: java.nio.file.FileAlreadyExistsException =>
        throw new ConditionalCheckFailedException(
          s"state $name: revision $next already written")
    }
  }

  /** Retry loop: fetch → transform → conditional write (the
    * StateSynchronizer.updateState pattern).
    */
  def updateState(f: Option[String] => String, maxRetries: Int = 20): (Long, String) = {
    var attempt = 0
    while (attempt <= maxRetries) {
      val (rev, cur) = fetch()
      val next = f(cur)
      try return (writeConditionally(rev, next), next)
      catch { case _: ConditionalCheckFailedException => attempt += 1 }
    }
    throw new ConditionalCheckFailedException(s"state $name: update lost $maxRetries races")
  }

  /** Compact old revisions (StateSynchronizer.compact analog): drop all but
    * the newest `keep` revisions.
    */
  def compact(keep: Int = 1): Unit = {
    val revs =
      try fs.listStatus(dir).iterator.map(_.getPath.getName)
        .collect { case n if n.startsWith("rev-") => n.stripPrefix("rev-").toLong }.toSeq.sorted
      catch { case _: FileNotFoundException => return }
    revs.dropRight(keep).foreach(r => fs.delete(revPath(r), false))
  }
}
