package graft.util

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.time.Instant
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Structured pipeline logging with the reference logger's semantics
  * (ref `jobs/logger.py:30-71`): one global setup at startup fans each
  * record out to
  *
  *  - the console (plain text, all levels — via slf4j so it lands in
  *    the same stream as Spark's own logging),
  *  - `<name>.log` — JSON lines, INFO and above, size-rotated with
  *    bounded retention, rotated segments compressed to `.zip`,
  *  - `<name>.error.log` — JSON lines, ERROR only, its own (smaller)
  *    rotation and (longer) retention,
  *
  * with per-module binding and free-form key-value context on every
  * record. The JSON file is the queryable ledger (the reference greps /
  * loads it to debug failed ingests); the error file is the small one a
  * responder reads first.
  *
  * Defaults mirror the reference: 10 MB / 30 days for the main file,
  * 5 MB / 60 days for the error file, `LOG_DIR` env override for the
  * directory. The clock is injectable so retention is testable.
  */
final class StructuredLog private[util] (
    val name: String,
    val dir: Path,
    fileMaxBytes: Long,
    errorMaxBytes: Long,
    retentionMillis: Long,
    errorRetentionMillis: Long,
    clock: () => Long) {

  private val console = org.slf4j.LoggerFactory.getLogger(s"graft.log.$name")
  val mainFile: Path = dir.resolve(s"$name.log")
  val errorFile: Path = dir.resolve(s"$name.error.log")

  /** A logger bound to one module name — the reference's
    * `get_logger(__name__)` shape.
    */
  def forModule(module: String): StructuredLog.Bound =
    new StructuredLog.Bound(this, module)

  def debug(module: String, message: String, kv: (String, Any)*): Unit = {
    console.debug(render(module, message, kv))
    // console-only: the JSON file is INFO and above, like the reference
  }

  def info(module: String, message: String, kv: (String, Any)*): Unit = {
    console.info(render(module, message, kv))
    write(mainFile, fileMaxBytes, retentionMillis, json("INFO", module, message, kv))
  }

  def warn(module: String, message: String, kv: (String, Any)*): Unit = {
    console.warn(render(module, message, kv))
    write(mainFile, fileMaxBytes, retentionMillis, json("WARN", module, message, kv))
  }

  def error(module: String, message: String, kv: (String, Any)*): Unit = {
    console.error(render(module, message, kv))
    write(mainFile, fileMaxBytes, retentionMillis, json("ERROR", module, message, kv))
    write(errorFile, errorMaxBytes, errorRetentionMillis, json("ERROR", module, message, kv))
  }

  private def render(module: String, message: String, kv: Seq[(String, Any)]): String =
    if (kv.isEmpty) s"$module | $message"
    else s"$module | $message | " + kv.map { case (k, v) => s"$k=$v" }.mkString(" ")

  private def json(level: String, module: String, message: String,
      kv: Seq[(String, Any)]): String = {
    val extra = kv.map { case (k, v) =>
      val jv = v match {
        case n: Int => n.toString
        case n: Long => n.toString
        case n: Double => n.toString
        case b: Boolean => b.toString
        case other => Json.quote(String.valueOf(other))
      }
      s"${Json.quote(k)}: $jv"
    }.mkString("{", ", ", "}")
    s"""{"ts": ${Json.quote(Instant.ofEpochMilli(clock()).toString)}, """ +
      s""""level": ${Json.quote(level)}, "module": ${Json.quote(module)}, """ +
      s""""message": ${Json.quote(message)}, "extra": $extra}"""
  }

  private def write(target: Path, maxBytes: Long, retention: Long,
      line: String): Unit = synchronized {
    try {
      rotateIfNeeded(target, maxBytes)
      sweepRetention(target, retention)
      Files.write(target, (line + "\n").getBytes(UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    } catch {
      // logging must never take the pipeline down with it
      case e: Throwable => console.warn(s"structured log write failed: ${e.getMessage}")
    }
  }

  /** Size-based rotation: when the live file would exceed `maxBytes`,
    * compress it to `<file>.<millis>.zip` and start a fresh segment
    * (the reference's `rotation=".. MB"` + `compression="zip"`).
    */
  private def rotateIfNeeded(target: Path, maxBytes: Long): Unit = {
    if (!Files.exists(target) || Files.size(target) < maxBytes) return
    var rotated = Paths.get(s"$target.${clock()}.zip")
    var n = 0
    while (Files.exists(rotated)) { n += 1; rotated = Paths.get(s"$target.${clock()}-$n.zip") }
    val zos = new ZipOutputStream(Files.newOutputStream(rotated))
    try {
      zos.putNextEntry(new ZipEntry(target.getFileName.toString))
      zos.write(Files.readAllBytes(target))
      zos.closeEntry()
    } finally zos.close()
    Files.delete(target)
  }

  /** Age-based retention over this file's rotated `.zip` segments (the
    * reference's `retention=".. days"`); the live file is never swept.
    */
  private def sweepRetention(target: Path, retention: Long): Unit = {
    val prefix = target.getFileName.toString + "."
    val cutoff = clock() - retention
    val segments = Option(dir.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(prefix) && f.getName.endsWith(".zip"))
    segments.filter(_.lastModified() < cutoff).foreach(_.delete())
  }
}

object StructuredLog {
  /** The process-wide logger, like the reference's module-level loguru
    * singleton: `setup()` once at startup, every component that wants
    * the structured ledger reads [[current]].
    */
  @volatile private var active: Option[StructuredLog] = None

  val DayMillis: Long = 24L * 3600 * 1000

  /** Configure the global logger (reference `setup_logger`). Defaults
    * mirror the reference: `LOG_DIR` env (or `logs/`), 10 MB main
    * rotation / 30-day retention, 5 MB error rotation / 60-day
    * retention.
    */
  def setup(
      name: String = "app",
      dir: String = sys.env.getOrElse("LOG_DIR", "logs"),
      fileMaxBytes: Long = 10L * 1024 * 1024,
      errorMaxBytes: Long = 5L * 1024 * 1024,
      retentionMillis: Long = 30 * DayMillis,
      errorRetentionMillis: Long = 60 * DayMillis,
      clock: () => Long = () => System.currentTimeMillis()): StructuredLog = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    val log = new StructuredLog(name, p, fileMaxBytes, errorMaxBytes,
      retentionMillis, errorRetentionMillis, clock)
    active = Some(log)
    log
  }

  def current: Option[StructuredLog] = active

  /** Unset the global logger (tests). */
  def reset(): Unit = active = None

  /** A module-bound view — `log.info("msg", kv)` without repeating the
    * module name (reference `get_logger(__name__)`).
    */
  final class Bound(underlying: StructuredLog, module: String) {
    def debug(message: String, kv: (String, Any)*): Unit = underlying.debug(module, message, kv: _*)
    def info(message: String, kv: (String, Any)*): Unit = underlying.info(module, message, kv: _*)
    def warn(message: String, kv: (String, Any)*): Unit = underlying.warn(module, message, kv: _*)
    def error(message: String, kv: (String, Any)*): Unit = underlying.error(module, message, kv: _*)
  }
}
