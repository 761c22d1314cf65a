package graft.core

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Pins the PinnedResult contract (verdict r14 #3): one locked
  * implementation of build → persist → force → staging-release → rotate,
  * replacing ~16 hand-rolled copies in two disciplines.
  */
class PinnedResultSpec extends SparkSpec {
  import spark.implicits._

  test("swap persists, forces, and returns the built frame") {
    val pin = new PinnedResult
    val out = pin.swap(Seq(1, 2, 3).toDF("x"))
    assert(out.storageLevel == StorageLevel.MEMORY_AND_DISK)
    // forced: the cached plan is already materialized
    assert(out.count() == 3)
    out.unpersist(false)
  }

  test("rotation unpersists the displaced generation, never the current") {
    val pin = new PinnedResult
    val g1 = pin.swap(Seq(1).toDF("x"))
    assert(g1.storageLevel == StorageLevel.MEMORY_AND_DISK)
    val g2 = pin.swap(Seq(1, 2).toDF("x"))
    assert(g1.storageLevel == StorageLevel.NONE, "displaced gen released")
    assert(g2.storageLevel == StorageLevel.MEMORY_AND_DISK)
    val g2again = pin.swap(g2) // re-pinning the same frame must not tear it down
    assert(g2again.storageLevel == StorageLevel.MEMORY_AND_DISK)
    g2again.unpersist(false)
  }

  test("staging release fires after the force, inside the lock") {
    val pin = new PinnedResult
    val staged = Seq(1, 2).toDF("x")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var releasedAtForce = false
    val out = pin.swapStaged {
      // the result depends on the staged frame; the helper must force it
      // BEFORE the release thunk runs
      (staged.select(org.apache.spark.sql.functions.sum("x").as("s")),
        () => {
          releasedAtForce = true
          staged.unpersist(false)
        })
    }
    assert(releasedAtForce)
    assert(staged.storageLevel == StorageLevel.NONE)
    assert(collectSingle[Long](out) == 3L)
    out.unpersist(false)
  }

  test("concurrent swaps serialize: every generation but the last released") {
    val pin = new PinnedResult
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val gens = java.util.Collections.synchronizedList(
      new java.util.ArrayList[DataFrame]())
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        val out = pin.swap {
          val n = inFlight.incrementAndGet()
          maxInFlight.getAndUpdate(m => math.max(m, n))
          try Seq.fill(i)(i).toDF("x")
          finally inFlight.decrementAndGet()
        }
        gens.add(out)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(maxInFlight.get() == 1, "builds must never overlap")
    import scala.jdk.CollectionConverters._
    val live = gens.asScala.count(_.storageLevel != StorageLevel.NONE)
    assert(live == 1, "exactly the final generation stays pinned")
    gens.asScala.foreach(_.unpersist(false))
  }
}
