package graft.kv

import graft.core.ConditionalCheckFailedException
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Direct StateSynchronizer coverage mirroring the reference's
  * StateSynchronizerTest (client/.../state/StateSynchronizer.java:44):
  * conditional-write semantics, the lost-update retry loop under real
  * thread contention (the shared-counter fixture), and compaction
  * preserving the newest state.
  */
class StateSynchronizerSpec extends AnyFunSuite {

  private def fresh(): StateSynchronizer =
    new StateSynchronizer(Files.createTempDirectory("graft-sync").toString, "t")

  test("conditional writes: stale revision loses, fetch sees latest") {
    val s = fresh()
    assert(s.fetch() == (-1L, None))
    val r0 = s.writeConditionally(-1L, "a")
    assert(r0 == 0L && s.fetch() == (0L, Some("a")))
    val r1 = s.writeConditionally(0L, "b")
    assert(r1 == 1L && s.fetch() == (1L, Some("b")))
    // write against a stale revision must fail without clobbering state
    assertThrows[ConditionalCheckFailedException](s.writeConditionally(0L, "X"))
    assert(s.fetch() == (1L, Some("b")))
  }

  test("updateState serializes concurrent increments (shared-counter fixture)") {
    val root = Files.createTempDirectory("graft-sync-c").toString
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val writers = (1 to 8).map { _ =>
        Future {
          // each client gets its own instance, like separate processes
          val s = new StateSynchronizer(root, "ctr")
          for (_ <- 1 to 25)
            s.updateState(cur => (cur.map(_.toLong).getOrElse(0L) + 1L).toString,
              maxRetries = 500)
        }
      }
      Await.result(Future.sequence(writers), 120.seconds)
      val (rev, st) = new StateSynchronizer(root, "ctr").fetch()
      assert(st.contains("200"), s"lost updates: counter = $st")
      assert(rev == 199L, "exactly one revision per successful update")
    } finally pool.shutdown()
  }

  test("compact keeps the newest state and later updates continue") {
    val s = fresh()
    for (i <- 0 until 10)
      s.updateState(cur => cur.map(_ + s",$i").getOrElse(i.toString))
    val before = s.fetch()
    s.compact(keep = 1)
    assert(s.fetch() == before, "compaction must not change the visible state")
    val (rev, st) = s.updateState(cur => cur.get + ",post")
    assert(rev == before._1 + 1 && st.endsWith(",post"))
  }
}
