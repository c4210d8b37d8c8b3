package graft.lake

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.Base64

import org.slf4j.LoggerFactory

/** Email alert sender (reference X5 — `jobs/utils/alerts.py:11-40`):
  * env-gated exactly like the reference — when `SMTP_USER`/`SMTP_PASSWORD`
  * are unset it logs and returns instead of failing the pipeline, so the
  * default deployment degrades to log-only alerts. The SMTP dialogue
  * (EHLO → optional STARTTLS → AUTH LOGIN → MAIL/RCPT/DATA) is spoken
  * over a plain JDK socket, upgraded via SSLSocketFactory when the
  * server advertises STARTTLS — no mail dependency.
  *
  * Plugs into the alert seams ([[FinancePipeline]],
  * [[graft.streaming.StreamingIngest]]) as `SmtpAlerts.fromEnv().alert`.
  */
final case class SmtpConfig(
    host: String,
    port: Int,
    user: String,
    password: String,
    useTls: Boolean = true)

class SmtpAlerts(config: Option[SmtpConfig]) {
  private val log = LoggerFactory.getLogger(getClass)

  /** `(subject, body) => Unit`, the shape every alert seam takes. */
  def alert(subject: String, body: String): Unit = config match {
    case None =>
      log.warn("SMTP not configured — skipping email alert: {}", subject)
    case Some(c) =>
      try {
        send(c, subject, body)
        log.info("Alert email sent: {} to {}", subject, c.user: Any)
      } catch {
        // alerting must never fail the pipeline (reference `:36-38`)
        case e: Exception =>
          log.error(s"Email failed: $subject", e)
      }
  }

  private def send(c: SmtpConfig, subject: String, body: String): Unit = {
    val plain = new Socket(c.host, c.port)
    try {
      var socket: Socket = plain
      var in = new BufferedReader(
        new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
      var out = new PrintWriter(socket.getOutputStream, true)

      def readReply(): String = {
        // multi-line replies: "250-..." continues, "250 ..." ends
        var line = in.readLine()
        val code = line.take(3)
        while (line != null && line.length > 3 && line.charAt(3) == '-')
          line = in.readLine()
        if (code.headOption.exists(ch => ch == '4' || ch == '5'))
          sys.error(s"SMTP error: $line")
        code
      }

      def cmd(s: String): String = { out.println(s); readReply() }

      readReply() // 220 greeting
      cmd("EHLO graft")
      if (c.useTls) {
        cmd("STARTTLS")
        val factory = javax.net.ssl.SSLSocketFactory.getDefault
          .asInstanceOf[javax.net.ssl.SSLSocketFactory]
        val tls = factory.createSocket(plain, c.host, c.port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        tls.startHandshake()
        socket = tls
        in = new BufferedReader(
          new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
        out = new PrintWriter(socket.getOutputStream, true)
        cmd("EHLO graft")
      }
      val b64 = (s: String) =>
        Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
      cmd("AUTH LOGIN")
      cmd(b64(c.user))
      cmd(b64(c.password))
      cmd(s"MAIL FROM:<${c.user}>")
      cmd(s"RCPT TO:<${c.user}>") // self-addressed, like the reference
      cmd("DATA")
      // reference wraps the report in <pre> html
      out.println(s"From: ${c.user}")
      out.println(s"To: ${c.user}")
      out.println(s"Subject: $subject")
      out.println("Content-Type: text/html; charset=utf-8")
      out.println()
      out.println(s"<pre>$body</pre>")
      cmd(".")
      cmd("QUIT")
    } finally plain.close()
  }
}

object SmtpAlerts {
  /** Reference env contract: host/port default, user+password gate. */
  def fromEnv(env: Map[String, String] = sys.env): SmtpAlerts = {
    val cfg = for {
      user <- env.get("SMTP_USER").filter(_.nonEmpty)
      password <- env.get("SMTP_PASSWORD").filter(_.nonEmpty)
    } yield SmtpConfig(
      host = env.getOrElse("SMTP_HOST", "smtp.gmail.com"),
      port = env.get("SMTP_PORT").flatMap(_.toIntOption).getOrElse(587),
      user = user,
      password = password)
    new SmtpAlerts(cfg)
  }

  /** DQ-failure alert with the reference's subject shape
    * (`jobs/utils/alerts.py:39-40`).
    */
  def qualityAlert(alerts: SmtpAlerts)(filepath: String, report: String): Unit = {
    val filename = filepath.split('/').last
    alerts.alert(s"[ETL] Data Quality Failed: $filename", report)
  }
}
