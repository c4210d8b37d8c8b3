package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{SmtpAlerts, SmtpConfig}

class SmtpAlertsSpec extends AnyFunSuite {

  test("unconfigured env degrades to log-only, never throws") {
    SmtpAlerts.fromEnv(Map.empty).alert("subj", "body")
    SmtpAlerts.fromEnv(Map("SMTP_USER" -> "u")).alert("subj", "body") // no password
  }

  test("configured sender speaks the SMTP dialogue end-to-end") {
    val server = new ServerSocket(0)
    val received = new java.util.concurrent.LinkedBlockingQueue[String]()
    val t = new Thread(() => {
      val s = server.accept()
      val in = new BufferedReader(
        new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
      val out = new PrintWriter(s.getOutputStream, true)
      out.println("220 test ESMTP")
      var inData = false
      val data = new StringBuilder
      var line = in.readLine()
      while (line != null) {
        if (inData) {
          if (line == ".") {
            inData = false; received.put(data.toString); out.println("250 ok")
          } else data.append(line).append('\n')
        } else if (line.startsWith("DATA")) {
          inData = true; out.println("354 go")
        } else if (line.startsWith("QUIT")) {
          out.println("221 bye"); line = null
        } else out.println("250 ok")
        if (line != null) line = in.readLine()
      }
      s.close()
    })
    t.setDaemon(true)
    t.start()

    val alerts = new SmtpAlerts(Some(SmtpConfig(
      "127.0.0.1", server.getLocalPort, "ops@example.test", "pw", useTls = false)))
    SmtpAlerts.qualityAlert(alerts)("/lake/raw/finance_2024.csv", "3 checks failed")

    val msg = java.util.concurrent.TimeUnit.SECONDS
    val got = received.poll(10, msg)
    server.close()
    assert(got != null, "server never received DATA")
    assert(got.contains("Subject: [ETL] Data Quality Failed: finance_2024.csv"))
    assert(got.contains("<pre>3 checks failed</pre>"))
  }
}
