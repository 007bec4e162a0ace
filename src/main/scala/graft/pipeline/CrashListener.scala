package graft.pipeline

import org.apache.spark.sql.streaming.StreamingQueryListener

/** O19 crash reporting (reference `Monitoring.scala:62-77`: Sentry
  * `captureError` on any throwable escaping the worker): the Spark-native
  * seam is the streaming listener bus — a query that dies with an
  * exception fires `onQueryTerminated` with the error, and this listener
  * forwards it to [[Lifecycle.storageWriteFailed]] (the same
  * self-describing failure event the reference emits alongside Sentry,
  * `SnowplowTracking.scala:117-140`). A Sentry adapter would swap the
  * forwarding target; the hook point stays.
  */
final class CrashListener(lifecycle: Lifecycle) extends StreamingQueryListener {

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = ()

  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit =
    event.exception.foreach(lifecycle.storageWriteFailed)
}
