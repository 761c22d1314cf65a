package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** One pinned-result generation per declared query: build → persist
  * (MEMORY_AND_DISK) → force → release the build's staging pins → rotate
  * the generation reference → unpersist the displaced generation, the
  * WHOLE sequence serialized on this instance (the x354Lock discipline,
  * verdict r13 #2 / r14 #3).
  *
  * Before this helper the rotation existed as ~16 hand-rolled copies in
  * two disciplines — x354 locked, everything else a bare
  * `AtomicReference.getAndSet` + unpersist, where two concurrent
  * invocations could each build, swap, and unpersist the frame the other
  * had just returned to its caller mid-consumption (deterministic results
  * — the unpinned frame silently recomputes its full DAG — but the exact
  * waste class the lock exists to prevent). One implementation, one
  * discipline.
  *
  * Ordering contract inside the lock:
  *   1. the by-name `build` runs (so eager staging work — RangeRank
  *      boundary scans, intermediate pins — is serialized too);
  *   2. the result persists and is forced with count() — staging pins are
  *      still live, so the force rides them instead of recomputing;
  *   3. `releaseStaging` fires (now safe: the result is materialized);
  *   4. the generation reference rotates and the PREVIOUS generation
  *      unpersists (its readers, if any, fall back to recompute — the
  *      accepted cost of a rotating cache; what the lock removes is the
  *      CURRENT generation being torn down during its own build).
  *
  * The pinned frames are driver-metric-sized by convention (every caller
  * pins a bounded result: decile/quartile/source-row finales, probe-set
  * kNN, support-gated backbones) — the pin is about not re-running the
  * corpus-sized DAG per downstream consumer, not about caching data-sized
  * frames.
  */
final class PinnedResult {
  private val ref =
    new java.util.concurrent.atomic.AtomicReference[DataFrame]()

  /** Build with staging cleanup: `build` returns the UNPERSISTED result
    * frame plus a thunk releasing the build's staging pins (RangeRank
    * handles, intermediate persists). The thunk runs only after the
    * result is forced, so the force never recomputes what the staging
    * pins hold.
    */
  def swapStaged(build: => (DataFrame, () => Unit)): DataFrame =
    synchronized {
      val (df, releaseStaging) = build
      val out = df.persist(StorageLevel.MEMORY_AND_DISK)
      out.count()
      releaseStaging()
      val prev = ref.getAndSet(out)
      if (prev != null && (prev ne out)) prev.unpersist(false)
      out
    }

  /** Build with no staging pins to release. */
  def swap(build: => DataFrame): DataFrame =
    swapStaged((build, () => ()))
}
