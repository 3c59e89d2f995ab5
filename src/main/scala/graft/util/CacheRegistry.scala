package graft.util

import org.apache.spark.sql.Dataset

/** Caller-owned lifecycle for Datasets persisted INSIDE lazily-returned
  * plans. A function that returns a plan depending on an intermediate
  * persist cannot unpersist eagerly, and Spark's CacheManager holds every
  * `persist()` until an explicit `unpersist()` or session end
  * (ContextCleaner only reclaims RDD-level caches) — so such persists
  * register here and long-lived drivers (Bench / Verify) call
  * [[releaseAll]] once the returned plans have been materialized. One-shot
  * sessions can skip it: session shutdown drops the CacheManager entries.
  * A released plan that is re-used later recomputes; it does not fail.
  */
object CacheRegistry {

  private val live =
    java.util.Collections.synchronizedList(new java.util.ArrayList[Dataset[_]]())

  def register[T](ds: Dataset[T]): Dataset[T] = { live.add(ds); ds }

  def releaseAll(): Unit = {
    val snapshot = live.synchronized {
      val s = new java.util.ArrayList[Dataset[_]](live)
      live.clear()
      s
    }
    snapshot.forEach { ds =>
      try ds.unpersist()
      catch { case _: Exception => () } // session may already be stopped
    }
  }
}
