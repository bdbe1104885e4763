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
  */
object QueryCaches {

  def releaseOnTermination(
      spark: SparkSession,
      query: StreamingQuery,
      frames: Seq[DataFrame]): StreamingQuery = {
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == query.id) {
          frames.foreach(_.unpersist())
          spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(listener)
    query
  }
}
