package graft.pipeline

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.{Duration, Instant}

/** Batch-meta metrics in the StatsD wire format the reference emits
  * (reference StatsD.scala:17-18,51-91):
  *
  *   `<prefix>.count:<n>|c|#tag:value,...`
  *   `<prefix>.latency_collector_to_load:<seconds>|g|#tag:value,...`
  *
  * The formatting is pure (unit-testable); the UDP send is best-effort
  * like the reference's fire-and-forget Future.
  */
object StatsD {

  val CollectorLatencyName = "latency_collector_to_load"
  val CountName = "count"
  val DefaultPrefix = "graft.loader"

  sealed trait KVMetric { def key: String; def value: String; def tpe: String }
  final case class Gauge(key: String, value: String) extends KVMetric { def tpe = "g" }
  final case class Count(key: String, count: Long) extends KVMetric {
    def value: String = count.toString
    def tpe = "c"
  }

  final case class Meta(earliestTstamp: Option[Instant], count: Long)

  def fromMeta(meta: Meta, now: Instant = Instant.now()): List[KVMetric] =
    List(
      meta.earliestTstamp.map(t => Gauge(CollectorLatencyName, Duration.between(t, now).toSeconds.toString)),
      Some(Count(CountName, meta.count))).flatten

  def format(config: StatsDConfig, metric: KVMetric): String = {
    val tagStr = config.tags.map { case (k, v) => s"$k:$v" }.mkString(",")
    val prefix = config.prefix match {
      case Some(p) if p.endsWith(".") || p.isEmpty => p
      case Some(p)                                 => s"$p."
      case None                                    => s"$DefaultPrefix."
    }
    s"$prefix${metric.key}:${metric.value}|${metric.tpe}|#$tagStr"
  }

  /** Best-effort UDP datagrams; failures are swallowed (metrics must
    * never fail the pipeline — same stance as the reference). */
  def report(config: StatsDConfig, meta: Meta): Unit =
    try {
      val socket = new DatagramSocket()
      try {
        val ip = InetAddress.getByName(config.hostname)
        fromMeta(meta).foreach { m =>
          val bytes = format(config, m).getBytes(UTF_8)
          socket.send(new DatagramPacket(bytes, bytes.length, ip, config.port))
        }
      } finally socket.close()
    } catch { case scala.util.control.NonFatal(_) => () }
}
