package graft.pipeline

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.Instant
import java.util.concurrent.atomic.AtomicBoolean

/** Lifecycle tracking (reference SnowplowTracking.scala:89-176):
  * `app_initialized` on start, `app_heartbeat` every `heartbeatMs`
  * (reference hardcodes 300 000 ms), `app_shutdown` via JVM hook, and
  * `storage_write_failed` on emit failures. The reference posts
  * self-describing events to a collector; this engine appends the same
  * self-describing JSON lines to a local tracking file (a collector
  * adapter would swap the `emit` function).
  */
final class Lifecycle(
  trackingPath: String,
  appId: String,
  heartbeatMs: Long = 300000L,
  clock: () => Instant = () => Instant.now()) {

  private val stopped = new AtomicBoolean(false)
  private var heartbeatThread: Option[Thread] = None

  /** JSON string escape per RFC 8259: backslash, quote, and control
    * chars — `storageWriteFailed` feeds exception messages that may
    * contain any of them, and a tracking line must stay one valid JSON
    * object. */
  private def jsonEscape(v: String): String = {
    val sb = new StringBuilder(v.length + 8)
    v.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.toString
  }

  private def event(name: String, data: Map[String, String]): String = {
    val dataJson = (data + ("applicationName" -> appId))
      .map { case (k, v) => s""""${jsonEscape(k)}":"${jsonEscape(v)}"""" }
      .mkString("{", ",", s""","tstamp":"${clock()}"}""")
    s"""{"schema":"iglu:com.graft/$name/jsonschema/1-0-0","data":$dataJson}"""
  }

  private[pipeline] def emit(line: String): Unit = synchronized {
    val p = Paths.get(trackingPath)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, (line + "\n").getBytes(UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def start(): Unit = {
    emit(event("app_initialized", Map.empty))
    val t = new Thread(() => {
      while (!stopped.get()) {
        try Thread.sleep(heartbeatMs) catch { case _: InterruptedException => () }
        if (!stopped.get()) emit(event("app_heartbeat", Map.empty))
      }
    }, "graft-lifecycle-heartbeat")
    t.setDaemon(true)
    t.start()
    heartbeatThread = Some(t)
    sys.addShutdownHook { shutdown() }
  }

  def storageWriteFailed(message: String): Unit =
    emit(event("storage_write_failed", Map("message" -> message)))

  def shutdown(): Unit =
    if (stopped.compareAndSet(false, true)) {
      heartbeatThread.foreach(_.interrupt())
      emit(event("app_shutdown", Map.empty))
    }
}
