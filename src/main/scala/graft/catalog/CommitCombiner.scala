package graft.catalog

/** Per-JVM GROUP COMMIT for manifest CAS updates — the funnel that turns
  * N concurrent in-process committers into ONE store round trip.
  *
  * The r14 contention curve pinned the per-stream metadata ceiling at
  * ~1000/(RTT×3.1) commits/s on an object store, writer-count-invariant:
  * more in-process writers only added queueing (p50 ~11 s at 64 writers /
  * 50 ms RTT) and O(writers) billed ops, because every CAS round has one
  * winner and every loser re-reads and re-CASes. The reference's answer
  * to the same wall is group commit — OperationProcessor packs many
  * operations into one BookKeeper DataFrame
  * (segmentstore/server/.../logs/OperationProcessor.java, the
  * `dataFrameBuilder.append` batching loop) and AppendProcessor batches
  * appends per segment — so the store pays per BATCH, not per logical
  * operation. This class is the manifest-CAS analog: concurrent
  * `update()` callers enqueue their pure metadata transforms; one LEADER
  * drains the queue and applies the whole batch inside a single CAS'd
  * manifest version; every caller gets the committed metadata back.
  *
  * Mechanics (classic monitor-based flat combining):
  *  - A caller enqueues its [[CommitCombiner.Pending]] and, under the
  *    monitor, waits while a leader is busy. The first waiter to observe
  *    `!busy` with its request still unserved becomes the next leader.
  *  - The leader drains the WHOLE queue (requests that arrived while the
  *    previous commit's round trips were in flight — batch size therefore
  *    grows naturally with concurrency and is 1 in the uncontended case,
  *    which costs one uncontended monitor acquisition over the old path).
  *  - The leader composes the transforms IN ARRIVAL ORDER inside the raw
  *    CAS retry loop: the committed state is identical to the serial
  *    execution of the same transforms, they just land as one version.
  *  - Failure isolation: a transform that throws is excluded from the
  *    batch (its caller gets exactly that exception, nothing is
  *    committed on its behalf) while the rest of the batch commits —
  *    the same outcome serial execution would produce. Transforms may
  *    run more than once (the CAS loop retries on cross-process
  *    contention) and must be pure functions of the metadata, exactly
  *    as the non-combined `update()` contract always required.
  *
  * Scope: combining is PER CATALOG INSTANCE (per JVM in any real
  * deployment — specs and benches that model separate processes as
  * separate instances keep true CAS contention). Cross-process
  * contention stays on the r14 curve by construction: the batch commit
  * is one ordinary optimistic CAS among the other processes' commits.
  */
final class CommitCombiner[M] {
  import CommitCombiner.Pending

  /** FIFO of unserved requests; guarded by `this`. */
  private val queue = new java.util.ArrayDeque[Pending[M]]()
  /** True while a leader is committing a drained batch; guarded by `this`. */
  private var busy = false
  /** The thread currently leading a batch commit — lets a re-entrant
    * update from inside a transform (nothing does this today, but a
    * deadlock is the wrong way to find out) bypass the funnel.
    */
  @volatile private var leader: Thread = null

  def isLeaderThread: Boolean = leader eq Thread.currentThread()

  /** Submit one transform; blocks until a leader (possibly this thread)
    * has committed it, and returns/throws that request's own outcome.
    * `commitBatch` receives the drained batch in arrival order and must
    * complete/fail EVERY element before returning.
    */
  def submit(f: M => M, maxRetries: Int)
            (commitBatch: IndexedSeq[Pending[M]] => Unit): M = {
    val p = new Pending[M](f, maxRetries)
    var lead = false
    synchronized {
      queue.addLast(p)
      var interrupted = false
      try {
        while (!p.isDone && busy) {
          try wait()
          catch {
            case ie: InterruptedException =>
              // If no leader has picked the request up yet, withdraw it
              // and propagate — the transform will never run. Once a
              // leader holds it the commit is already in flight, so the
              // result must be awaited (it's one CAS round); remember
              // the interrupt and restore the flag on exit.
              if (!p.isDone && queue.remove(p)) throw ie
              interrupted = true
          }
        }
        if (!p.isDone) { busy = true; lead = true }
      } finally if (interrupted) Thread.currentThread().interrupt()
    }
    if (lead) {
      val batch = synchronized {
        val b = Vector.newBuilder[Pending[M]]
        while (!queue.isEmpty) b += queue.pollFirst()
        b.result()
      }
      leader = Thread.currentThread()
      try commitBatch(batch)
      finally {
        leader = null
        synchronized { busy = false; notifyAll() }
      }
    }
    p.get
  }
}

object CommitCombiner {
  /** One queued transform and its completion cell. `result` is volatile
    * so waiters that observed completion under the combiner monitor (or
    * the leader itself, after commitBatch) read it safely.
    */
  final class Pending[M](val f: M => M, val maxRetries: Int) {
    @volatile private var result: Either[Throwable, M] = null
    def isDone: Boolean = result != null
    def complete(m: M): Unit = result = Right(m)
    def fail(t: Throwable): Unit = result = Left(t)
    def get: M = result match {
      case Right(m) => m
      case Left(t)  => throw t
      case null     => throw new IllegalStateException(
        "pending commit neither completed nor failed by its leader")
    }
  }

  /** Control signal: every transform in a batch failed, so there is
    * nothing to commit — the leader skips the CAS entirely (the old
    * serial path committed nothing when a lone transform threw, and a
    * batch of all-failures must not mint an empty manifest version).
    */
  private[catalog] object AllTransformsFailed
    extends RuntimeException("all transforms in batch failed")
    with scala.util.control.NoStackTrace
}
