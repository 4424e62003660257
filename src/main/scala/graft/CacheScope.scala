package graft

import org.apache.spark.sql.DataFrame

/** Release discipline for the operators' CACHE CONTRACT (see Dedup):
  * operators persist() intermediates that are reused by several branches
  * of the lazy plan they return, and cannot unpersist them eagerly — the
  * returned plan has not run yet. This scope closes the loop WITHOUT the
  * blanket `spark.catalog.clearCache()` hammer (which also evicts blocks
  * a composing caller still owns):
  *
  *  - operators route internal persists through [[pin]];
  *  - callers wrap build+consume in [[materializeAndRelease]]: the plan
  *    is built (pins recorded), the terminal action runs, then exactly
  *    the recorded pins are dropped. Nested scopes record into their own
  *    frame; pre-existing caches are never touched.
  *
  * Pins are recorded per-thread: plan CONSTRUCTION is driver-side on the
  * caller's thread (persist() marks the plan for caching without running
  * a job), so every operator-internal pin lands in the scope that is
  * building the query. Spark's executor/job threads never call pin.
  * With no active scope, pin() degrades to a plain persist() and the
  * original contract (caller releases, e.g. per-query clearCache)
  * applies unchanged.
  */
object CacheScope {

  private val scopes =
    new ThreadLocal[List[scala.collection.mutable.Buffer[DataFrame]]] {
      override def initialValue: List[scala.collection.mutable.Buffer[DataFrame]] = Nil
    }

  /** Spark's CacheManager dedups cache entries by canonicalized plan
    * (sameResult): two operators pinning the SAME sub-plan share one
    * entry, and a per-DataFrame unpersist would evict it for both. Pins
    * are therefore reference-counted on the canonical plan; a block is
    * only unpersisted when the last scope holding it releases. */
  private val refs = scala.collection.mutable.HashMap[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int]()

  private def keyOf(df: DataFrame) = df.queryExecution.analyzed.canonicalized

  /** Operator-side: persist `df` and record it in the innermost active
    * release scope (no-op recording when no scope is active). */
  private[graft] def pin(df: DataFrame): DataFrame = {
    df.persist()
    scopes.get() match {
      case top :: _ =>
        refs.synchronized {
          refs.updateWith(keyOf(df))(c => Some(c.getOrElse(0) + 1)) }
        top += df
      case Nil =>
    }
    df
  }

  private def release(dfs: Seq[DataFrame]): Unit =
    dfs.foreach { df =>
      val k = keyOf(df)
      val drop = refs.synchronized {
        refs.get(k) match {
          case Some(1) => refs.remove(k); true
          case Some(n) => refs(k) = n - 1; false
          case None    => true
        }
      }
      if (drop) df.unpersist(true)
    }

  /** Best-effort release of a `localCheckpoint`'s persisted blocks once
    * no plan will read them again (r18 ADVICE: superseded iterative
    * state — fixpoint carries, per-superstep label frames — otherwise
    * lingers until the ContextCleaner GCs the dereferenced RDDs, which
    * is real storage pressure inside a multi-pass query's own window).
    * A local checkpoint has no recompute path, so callers must
    * guarantee the frame is dead before freeing; non-checkpoint frames
    * (anything whose root is not the checkpoint's LogicalRDD) are a
    * safe no-op. */
  private[graft] def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Caller-side: build a plan with `body` (operator pins recorded), run
    * the terminal `action` on it, then unpersist exactly the recorded
    * pins (blocking, so a following cache-emptiness check is
    * deterministic) — minus any block another live scope still holds.
    * Returns the action's result; pins are released on every exit path. */
  def materializeAndRelease[A](body: => DataFrame)(action: DataFrame => A): A = {
    val buf = scala.collection.mutable.Buffer.empty[DataFrame]
    scopes.set(buf :: scopes.get())
    val df =
      try body
      catch {
        case e: Throwable =>
          release(buf.toSeq); throw e
      } finally scopes.set(scopes.get().drop(1))
    try action(df)
    finally release(buf.toSeq)
  }
}
