package graft.storage

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FSDataOutputStream, FileAlreadyExistsException, FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

import java.net.URI

/** Test/bench shim emulating the OBJECT-STORE filesystem contract the
  * engine's CAS design claims to survive (SCALING.md "conditional put on
  * object stores") — every CAS suite otherwise runs on the local-FS
  * CREATE_NEW path, which is kernel-atomic, list-consistent and
  * sub-millisecond, i.e. strictly STRONGER and ~50× faster than s3a/gcs.
  * Lives in the main tree (not test) because
  * `tools.CommitContentionBench` drives the commit path against it at
  * simulated RTT — the per-stream commit-ceiling numbers in SCALING.md
  * come from exactly this contract. Never on any production path:
  * nothing registers the `oscas` scheme except tests and the bench.
  *
  * Contract points:
  *
  *   1. `create(overwrite = false)` is NOT kernel-atomic: the store's own
  *      conditional-put arbitration (a JVM-wide monitor here, If-None-
  *      Match on a real store) decides the winner; the loser gets
  *      Hadoop's FileAlreadyExistsException, not nio's — exercising the
  *      engine's non-`file:` CAS branch end to end
  *      (`CasFiles.createExclusive` takes `fs.create(path, false)` for
  *      any scheme but `file`).
  *   2. LIST-AFTER-WRITE LAG on manifest files: a freshly-committed
  *      manifest stays INVISIBLE to `listStatus` for `lagMs` — readers
  *      resolving versions by listing must fall back one version
  *      (`getStream`'s documented contract) and writers CASing against a
  *      stale latest must lose and retry until the listing catches up.
  *      Direct `open`/`getFileStatus` by exact path stay consistent
  *      (read-after-write holds on current stores; discovery is what
  *      lags).
  *
  * Register with `fs.oscas.impl` → this class; roots look like
  * `oscas:///tmp/...` and map onto the local disk underneath.
  */
class LaggedObjectStoreFs extends RawLocalFileSystem {
  import LaggedObjectStoreFs._

  override def getScheme: String = "oscas"
  override def getUri: URI = URI.create("oscas:///")

  private def key(f: Path): String = f.toUri.getPath

  private def registerLag(f: Path): Unit = {
    val k = key(f)
    if (lagged(k)) visibleAt.put(k, System.currentTimeMillis() + lagMs)
  }

  private def conditionalCreate[T](f: Path, overwrite: Boolean)(mk: => T): T =
    if (overwrite) mk
    else lock.synchronized {
      // the store, not the kernel, arbitrates: exists-check + create are
      // one step only because every creator goes through this monitor
      if (exists(f)) throw new FileAlreadyExistsException(s"conditional put lost: $f")
      val out = mk
      registerLag(f)
      out
    }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    charge(conditionalCreate(f, overwrite)(
      super.create(f, permission, true, bufferSize, replication, blockSize, progress)))

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    charge(conditionalCreate(f, overwrite)(
      super.create(f, true, bufferSize, replication, blockSize, progress)))

  override def createNonRecursive(f: Path, permission: FsPermission,
                                  overwrite: Boolean, bufferSize: Int,
                                  replication: Short, blockSize: Long,
                                  progress: Progressable): FSDataOutputStream =
    charge(conditionalCreate(f, overwrite)(
      super.createNonRecursive(f, permission, true, bufferSize, replication,
        blockSize, progress)))

  override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream =
    charge(super.open(f, bufferSize))

  override def delete(f: Path, recursive: Boolean): Boolean =
    charge(super.delete(f, recursive))

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    charge(super.mkdirs(f, permission))

  override def rename(src: Path, dst: Path): Boolean =
    charge(super.rename(src, dst))

  /** RawLocal's DeprecatedRawLocalFileStatus loads permissions lazily via
    * `new java.io.File(uri)`, which rejects any scheme but `file` — so
    * every status leaves this FS with its metadata already materialized
    * (permissions are irrelevant to the contract under test).
    */
  private def eager(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
      st.getModificationTime, st.getAccessTime,
      if (st.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "graft", "graft", st.getPath)

  override def getFileStatus(f: Path): FileStatus =
    charge(eager(super.getFileStatus(f)))

  override def listStatus(f: Path): Array[FileStatus] = charge {
    val now = System.currentTimeMillis()
    super.listStatus(f).filter { st =>
      val t = visibleAt.get(key(st.getPath))
      if (t == null) true
      else if (t <= now) { visibleAt.remove(key(st.getPath)); true }
      else false
    }.map(eager)
  }
}

object LaggedObjectStoreFs {
  private val lock = new Object
  private val visibleAt = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** How long a freshly-created manifest stays invisible to listings. */
  @volatile var lagMs: Long = 0L

  /** Simulated per-operation ROUND-TRIP latency — the third object-store
    * contract point (an S3/GCS metadata op is ~10–50 ms, vs microseconds
    * on the local FS every other suite runs on). Charged once per
    * user-visible operation (create/open/getFileStatus/listStatus/
    * delete/mkdirs/rename), BEFORE the body so a conditional create
    * sleeps in "network transit" and only then takes the arbitration
    * monitor — concurrent CASes overlap their RTTs exactly as against a
    * real store, instead of serializing through the monitor. Nested
    * internal calls (RawLocalFileSystem materializing listing children
    * through getFileStatus, create's implicit mkdirs) ride the SAME
    * charge via a reentrancy guard — one round trip per op, like the
    * wire. Drives `tools.CommitContentionBench`'s RTT legs and the
    * latency ConcurrencySpec case.
    */
  @volatile var opLatencyMs: Long = 0L

  /** Round trips charged since JVM start (only while opLatencyMs > 0) —
    * lets the contention bench report OPS PER COMMIT, the multiplier
    * that turns an RTT into a per-stream commit ceiling.
    */
  val opsCharged = new java.util.concurrent.atomic.LongAdder()

  private val inOp: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  private def charge[T](body: => T): T = {
    if (opLatencyMs <= 0L || inOp.get()) body
    else {
      inOp.set(java.lang.Boolean.TRUE)
      opsCharged.increment()
      try { Thread.sleep(opLatencyMs); body }
      finally inOp.set(java.lang.Boolean.FALSE)
    }
  }

  /** Which files lag: manifest-version discovery is the contract under
    * test — and the GC floor chain records (`floor-<seq>.json`), whose
    * read path claims list-lag immunity via exact-key probes (the LIST
    * fallback only seeds the probe walk, never terminates it). Data
    * files stay list-consistent so Spark's own output committers are
    * not part of the experiment.
    */
  private def lagged(path: String): Boolean = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    name.startsWith("manifest-") || name.startsWith("floor-")
  }

  def reset(): Unit = { visibleAt.clear(); lagMs = 0L; opLatencyMs = 0L }
}
