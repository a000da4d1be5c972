package graft.quality

import org.scalatest.funsuite.AnyFunSuite
import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import graft.TestSpark

/** Live local-SMTP delivery (the `IngestHttpSpec` pattern): a JDK
  * `ServerSocket` speaks just enough RFC 5321 to accept one message and
  * record the full dialogue, so the adapter's envelope, headers,
  * dot-stuffing, auth, and error handling are proven against a real
  * socket rather than a mock.
  */
class ReporterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** One-session fake SMTP server. Returns (port, () => recorded). */
  private def withSmtp(requireAuth: Boolean, rejectRcpt: Boolean = false)(
      test: (Int, () => SmtpSession) => Unit): Unit = {
    val server = new ServerSocket(0)
    val session = new SmtpSession
    val t = new Thread(() => {
      val s = server.accept()
      val in = new BufferedReader(
        new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
      val out = new OutputStreamWriter(s.getOutputStream, StandardCharsets.UTF_8)
      def reply(r: String): Unit = { out.write(r + "\r\n"); out.flush() }
      reply("220 fake.smtp ready")
      var inData = false
      var authed = !requireAuth
      var authStep = 0
      var done = false
      var line = in.readLine()
      while (!done && line != null) {
        if (inData) {
          if (line == ".") { inData = false; reply("250 OK queued") }
          else session.data += (if (line.startsWith("..")) line.drop(1) else line)
        } else {
          session.commands += line
          val up = line.toUpperCase
          if (up.startsWith("EHLO")) { reply("250-fake.smtp"); reply("250 AUTH LOGIN") }
          else if (up.startsWith("AUTH LOGIN")) { authStep = 1; reply("334 VXNlcm5hbWU6") }
          else if (authStep == 1) { session.authUser = dec(line); authStep = 2; reply("334 UGFzc3dvcmQ6") }
          else if (authStep == 2) { session.authPass = dec(line); authStep = 0; authed = true; reply("235 ok") }
          else if (up.startsWith("MAIL FROM")) reply(if (authed) "250 ok" else "530 auth required")
          else if (up.startsWith("RCPT TO")) reply(if (rejectRcpt) "550 no such user" else "250 ok")
          else if (up.startsWith("DATA")) { inData = true; reply("354 go ahead") }
          else if (up.startsWith("QUIT")) { reply("221 bye"); s.close(); done = true }
          else reply("250 ok")
        }
        if (!done) line = in.readLine()
      }
    })
    t.setDaemon(true); t.start()
    try test(server.getLocalPort, () => session)
    finally server.close()
  }

  private def dec(b64: String): String =
    new String(java.util.Base64.getDecoder.decode(b64), StandardCharsets.UTF_8)

  private class SmtpSession {
    val commands = scala.collection.mutable.ArrayBuffer[String]()
    val data = scala.collection.mutable.ArrayBuffer[String]()
    @volatile var authUser: String = _
    @volatile var authPass: String = _
  }

  test("SmtpReporter delivers envelope, headers, html body, dot-stuffing") {
    withSmtp(requireAuth = false) { (port, sess) =>
      val r = new SmtpReporter("127.0.0.1", port, "graft@example.com")
      r.send("Raptor: 3 mismatches", Seq("a@x.com", "b@y.com"),
        "<html><body>\n<p>hi</p>\n.leading-dot line\n</body></html>")
      val s = sess()
      assert(s.commands.exists(_ == "MAIL FROM:<graft@example.com>"))
      assert(s.commands.exists(_ == "RCPT TO:<a@x.com>"))
      assert(s.commands.exists(_ == "RCPT TO:<b@y.com>"))
      assert(s.data.contains("Subject: Raptor: 3 mismatches"))
      assert(s.data.contains("Content-Type: text/html; charset=UTF-8"))
      assert(s.data.contains("<p>hi</p>"))
      assert(s.data.contains(".leading-dot line"),
        "dot-stuffed line must round-trip un-doubled")
      assert(s.commands.exists(_.toUpperCase.startsWith("QUIT")))
    }
  }

  test("SmtpReporter AUTH LOGIN round-trips credentials") {
    withSmtp(requireAuth = true) { (port, sess) =>
      val r = new SmtpReporter("127.0.0.1", port, "graft@example.com",
        auth = Some(("ops", "s3cret")))
      r.send("s", Seq("a@x.com"), "<p>b</p>")
      assert(sess().authUser == "ops" && sess().authPass == "s3cret")
    }
  }

  test("SmtpReporter fails fast on rejects and bad input") {
    withSmtp(requireAuth = false, rejectRcpt = true) { (port, _) =>
      val r = new SmtpReporter("127.0.0.1", port, "graft@example.com")
      val e = intercept[java.io.IOException](
        r.send("s", Seq("nobody@x.com"), "b"))
      assert(e.getMessage.contains("550"), e.getMessage)
    }
    val r = new SmtpReporter("127.0.0.1", 1, "graft@example.com")
    intercept[IllegalArgumentException](r.send("s", Seq.empty, "b"))
    intercept[IllegalArgumentException](
      r.send("s", Seq("evil@x.com>\r\nRCPT TO:<other@x.com"), "b"))
  }

  test("RaptorAlert: summary-driven subject policy, rendered body") {
    import spark.implicits._
    val src = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val tgt = Seq((1, "a"), (2, "c")).toDF("id", "v")
    val result = Raptor.compare(src, tgt, Seq("id"))
    withSmtp(requireAuth = false) { (port, sess) =>
      RaptorAlert.alert(
        new SmtpReporter("127.0.0.1", port, "graft@example.com"),
        result, "m_customer_metrics", Seq("oncall@x.com"))
      val s = sess()
      assert(s.data.contains("Subject: DATA RAPTOR Summary for m_customer_metrics"))
      assert(s.data.mkString("\n").contains("Run Summary"))
    }
    // empty summary → FAILED subject + fixed body (Raptor.py:258-260)
    val failed = result.copy(summary = result.summary.limit(0))
    withSmtp(requireAuth = false) { (port, sess) =>
      RaptorAlert.alert(
        new SmtpReporter("127.0.0.1", port, "graft@example.com"),
        failed, "m_customer_metrics", Seq("oncall@x.com"))
      val s = sess()
      assert(s.data.contains("Subject: DATA RAPTOR FAILED for m_customer_metrics"))
      assert(s.data.contains("<p>DATA RAPTOR FAILED</p>"))
    }
  }
}
