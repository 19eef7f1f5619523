package graft.operators

import org.apache.spark.sql.DataFrame

/** Generation-scoped caching for registry queries whose RETURNED frame
  * still references a cached intermediate: the query function returns a
  * lazy plan, so it cannot unpersist before its caller materializes —
  * but a bench loop re-invoking the query must not accumulate one
  * cached lineage per invocation for the life of the session.
  *
  * `scoped(name)(df)` caches `df` and, first, unpersists every frame
  * the SAME name cached on a previous invocation. Steady state is
  * therefore exactly one live generation per query name — bounded,
  * not leaking — and the previous generation's blocks are freed as
  * soon as the query runs again (blocking=false: eviction proceeds
  * asynchronously; the new generation never reads the old one).
  */
object CacheScope {
  private val live = scala.collection.mutable.Map[String, Seq[DataFrame]]()

  /** Cache `dfs` as query `name`'s current generation, releasing the
    * previous generation. Returns the inputs (cached) for inline use. */
  def scoped(name: String)(dfs: DataFrame*): Seq[DataFrame] = synchronized {
    live.getOrElse(name, Nil).foreach(_.unpersist(false))
    dfs.foreach(_.cache())
    live(name) = dfs
    dfs
  }

  /** Single-frame convenience. */
  def scoped1(name: String)(df: DataFrame): DataFrame = {
    scoped(name)(df); df
  }
}
