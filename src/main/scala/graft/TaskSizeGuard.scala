package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Machine-enforced task-closure-size gate (VERDICT r12 #3).
  *
  * Spark's `TaskSetManager` warns once per stage when a serialized task
  * exceeds `TASK_SIZE_TO_WARN_KIB` (1000 KiB) — the one signal that some
  * operator ships data inside task closures instead of through the scan /
  * broadcast / shuffle machinery (linear-in-SF driver state, the exact
  * failure the round-11 memory-sink replays hit at 16–65 MB/task).  The
  * scale gates used to grep stderr for it by hand; this appender captures
  * the same events in-process so `graft.Verify` fails the dump when any
  * fire.
  *
  * Implementation: one appender attached to the log4j2 ROOT logger config
  * (TaskSetManager logs at WARN and is additive, so its events reach root
  * regardless of which logger configs exist), filtering on the stable
  * message fragment.  No log levels or layouts are changed — the normal
  * console output is untouched.
  */
object TaskSizeGuard {

  private val hits = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Looser fallback for the exact fragment: any TaskSetManager WARN
    * talking about task size survives a Spark-upgrade rewording of the
    * message (ADVICE r13 #4 — keying on one literal silently blinds the
    * gate). TaskSetManager's other WARNs (lost/failed/speculation) never
    * mention "task size", so this stays oversized-specific.
    */
  private val loosePattern =
    java.util.regex.Pattern.compile("(?i)task of (?:very )?large size|recommended task size")

  private object Capture extends AbstractAppender(
      "graft-tasksize-guard", null, null, true, Property.EMPTY_ARRAY) {
    override def append(e: LogEvent): Unit = {
      val m = e.getMessage.getFormattedMessage
      val fromTsm = e.getLoggerName != null &&
        e.getLoggerName.endsWith("TaskSetManager")
      if (m != null && (m.contains("very large size") ||
          (fromTsm && loosePattern.matcher(m).find()))) hits.add(m)
    }
  }

  /** Attach the capture appender; idempotent, a no-op on non-core log4j2
    * implementations (the guard then simply reports zero hits).
    */
  def install(): Unit = LogManager.getContext(false) match {
    case ctx: LoggerContext =>
      if (!Capture.isStarted) Capture.start()
      val root = ctx.getConfiguration.getRootLogger
      if (!root.getAppenders.containsKey(Capture.getName)) {
        root.addAppender(Capture, Level.WARN, null)
        ctx.updateLoggers()
      }
    case _ => ()
  }

  /** Every oversized-task warning observed since install(). */
  def warnings: Seq[String] = {
    import scala.jdk.CollectionConverters._
    hits.asScala.toSeq
  }
}
