package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Releases per-query static caches (reference models, eval sets) when
  * their owning streaming query terminates. The frames are persisted for
  * the LIFE OF THE QUERY by design — batch-local == global scoring needs
  * one pinned materialization every micro-batch reads — but without a
  * termination hook they outlive the query for the application lifetime
  * (the round-12 StreamCurate lmCached finding). The listener matches on
  * the query id and self-removes after firing, so repeated `run()` calls
  * don't accumulate listeners.
  *
  * The registration RACES the query (round-13 ADVICE): an AvailableNow
  * query over a tiny or empty feed can terminate BEFORE `addListener`
  * runs, in which case QueryTerminatedEvent was dispatched to nobody and
  * both the frames and the listener would leak for the application
  * lifetime. After registering, we therefore check `query.isActive` and
  * release through the same once-guard the listener uses — exactly one
  * of the two paths fires, whichever observes termination first.
  */
object QueryCaches {

  def releaseOnTermination(
      spark: SparkSession,
      query: StreamingQuery,
      frames: Seq[DataFrame]): StreamingQuery = {
    val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    lazy val listener: StreamingQueryListener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == query.id) releaseOnce()
    }
    def releaseOnce(): Unit =
      if (released.compareAndSet(false, true)) {
        frames.foreach(_.unpersist())
        spark.streams.removeListener(listener)
      }
    spark.streams.addListener(listener)
    // close the registration window: if the query already terminated, the
    // event fired with no listener registered — release here instead (the
    // CAS makes the two paths mutually exclusive if the event races in)
    if (!query.isActive) releaseOnce()
    query
  }
}
