package graft.operators

import org.apache.spark.sql.DataFrame

/** Generation-scoped caching for registry queries whose RETURNED frame
  * still references a cached intermediate: the query function returns a
  * lazy plan, so it cannot unpersist before its caller materializes —
  * but a bench loop re-invoking the query must not accumulate one
  * cached lineage per invocation for the life of the session.
  *
  * Two cases on re-invocation:
  *  - SAME plan (the common bench loop — deterministic query, same
  *    sfDir): Spark's CacheManager already dedups by canonicalized
  *    plan, so re-caching adds no entry; the previous generation IS
  *    the warm cache and must NOT be dropped (unpersisting here would
  *    force a recompute per rep for nothing).
  *  - DIFFERENT plan (e.g. a different scale dir): the old generation
  *    is genuinely stale — unpersist it (blocking=false; the new
  *    generation never reads the old one) so entries stay bounded at
  *    one live generation per query name.
  */
object CacheScope {
  private val live = scala.collection.mutable.Map[String, Seq[DataFrame]]()

  /** Cache `dfs` as query `name`'s current generation, releasing any
    * previous generation whose plan no longer matches. Returns the
    * inputs (cached) for inline use.
    *
    * The stale check scans EVERY name's live generation, not just this
    * name's: CacheManager dedups entries by canonicalized plan across
    * the whole session, so two query names caching sameResult plans
    * share ONE cache entry — unpersisting the old generation of name A
    * would evict the entry name B's live generation still reads. An
    * old frame is released only when no live frame anywhere (fresh or
    * other-name) sameResult-matches it. */
  def scoped(name: String)(dfs: DataFrame*): Seq[DataFrame] = synchronized {
    val fresh = dfs.map(_.queryExecution.analyzed)
    val otherLive = (live - name).values.flatten.toSeq
    live.getOrElse(name, Nil).foreach { old =>
      val oldPlan = old.queryExecution.analyzed
      val stillNeeded = fresh.exists(_.sameResult(oldPlan)) ||
        otherLive.exists(_.queryExecution.analyzed.sameResult(oldPlan))
      if (!stillNeeded) old.unpersist(false)
    }
    dfs.foreach(_.cache())
    live(name) = dfs
    dfs
  }

  /** Single-frame convenience. */
  def scoped1(name: String)(df: DataFrame): DataFrame = {
    scoped(name)(df); df
  }
}
