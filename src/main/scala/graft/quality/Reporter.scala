package graft.quality

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.Base64

/** Alert delivery port for Raptor (Q7 end-to-end): the reference emails
  * its validation report over SMTP (`Raptor.py:141-157`, `smtplib
  * .SMTP_SSL('smtp.gmail.com', 465)` + login + `sendmail`). The engine
  * keeps rendering pure ([[RaptorReport.render]]) and delivery behind
  * this one-method port so a deployment can swap SMTP for Slack/
  * PagerDuty/stdout without touching any operator.
  */
trait Reporter {
  def send(subject: String, recipients: Seq[String], htmlBody: String): Unit
}

/** Minimal dependency-free SMTP client (RFC 5321 dialogue: EHLO,
  * optional AUTH LOGIN, MAIL FROM, RCPT TO, DATA with dot-stuffing,
  * QUIT) sending a single-part `text/html` MIME message — the same
  * message shape the reference's `MIMEText(body, 'html')` builds.
  *
  * Transport security is injected, not baked in: `socketFactory`
  * defaults to a plain TCP socket (the spec's local server; port-25
  * relays), and a production caller passes
  * `javax.net.ssl.SSLSocketFactory.getDefault.createSocket(_, _)` for
  * implicit TLS on 465 — credentials then ride AUTH LOGIN exactly as
  * the reference's `server.login`. Passwords stay out of the engine:
  * they arrive as constructor data from whatever secret store the
  * deployment uses (the reference hardcodes them in source — a
  * practice this port deliberately does not reproduce).
  */
final class SmtpReporter(
    host: String, port: Int, from: String,
    auth: Option[(String, String)] = None,
    socketFactory: (String, Int) => Socket = new Socket(_, _))
  extends Reporter {

  // `from` is config-sourced and written verbatim into both the MAIL
  // FROM envelope and the From header — the same CRLF-injection surface
  // as the recipients, validated with the same rule at construction so
  // a bad config fails at wiring time, not first send
  require(from.contains("@") && !from.exists("\r\n<>".contains(_)),
    s"SmtpReporter: malformed from address '$from'")

  override def send(subject: String, recipients: Seq[String],
                    htmlBody: String): Unit = {
    require(recipients.nonEmpty, "SmtpReporter: no recipients")
    require(recipients.forall(r => r.contains("@") && !r.exists("\r\n<>".contains(_))),
      s"SmtpReporter: malformed recipient among $recipients")
    val socket = socketFactory(host, port)
    try {
      val in = new BufferedReader(
        new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
      val out = new OutputStreamWriter(
        socket.getOutputStream, StandardCharsets.UTF_8)

      // SMTP replies may be multiline: "250-..." continues, "250 " ends.
      def expect(codes: Int*): String = {
        var line = in.readLine()
        val first = line
        while (line != null && line.length >= 4 && line.charAt(3) == '-')
          line = in.readLine()
        if (line == null)
          throw new java.io.IOException("SMTP: connection closed mid-reply")
        val code = line.take(3).toIntOption.getOrElse(-1)
        if (!codes.contains(code))
          throw new java.io.IOException(
            s"SMTP: expected ${codes.mkString("/")}, got: $first")
        line
      }
      def cmd(s: String, codes: Int*): Unit = {
        out.write(s + "\r\n"); out.flush(); expect(codes: _*); ()
      }

      expect(220)
      cmd("EHLO graft.local", 250)
      auth.foreach { case (user, pass) =>
        val b64 = (s: String) =>
          Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
        cmd("AUTH LOGIN", 334)
        cmd(b64(user), 334)
        cmd(b64(pass), 235)
      }
      cmd(s"MAIL FROM:<$from>", 250)
      recipients.foreach(r => cmd(s"RCPT TO:<$r>", 250, 251))
      cmd("DATA", 354)
      val headers = Seq(
        s"From: $from",
        s"To: ${recipients.mkString(", ")}",
        s"Subject: ${sanitizeHeader(subject)}",
        "MIME-Version: 1.0",
        "Content-Type: text/html; charset=UTF-8",
        "")
      val payload = (headers ++ htmlBody.split("\n", -1).toSeq)
        // dot-stuffing: a body line starting '.' would terminate DATA
        .map(l => if (l.startsWith(".")) "." + l else l)
        .map(_.stripSuffix("\r"))
        .mkString("\r\n")
      out.write(payload + "\r\n.\r\n"); out.flush(); expect(250)
      cmd("QUIT", 221)
    } finally socket.close()
  }

  /** CR/LF in a caller-supplied subject is header injection — strip. */
  private def sanitizeHeader(s: String): String =
    s.replaceAll("[\r\n]+", " ")
}

/** The reference's alert policy (`Raptor.py:248-262`): a populated run
  * summary mails "DATA RAPTOR Summary for <table>" with the full HTML
  * report; an empty one mails "DATA RAPTOR FAILED for <table>" with a
  * fixed failure body. The summary frame is already driver-bounded
  * (fixed description rows), so the emptiness probe is `isEmpty`, not a
  * count job.
  */
object RaptorAlert {
  def alert(reporter: Reporter, result: Raptor.Result, tableName: String,
            recipients: Seq[String]): Unit = {
    val ok = !result.summary.isEmpty
    val (subject, body) =
      if (ok) (s"DATA RAPTOR Summary for $tableName",
        RaptorReport.render(result, s"Raptor Validation — $tableName"))
      else (s"DATA RAPTOR FAILED for $tableName", "<p>DATA RAPTOR FAILED</p>")
    reporter.send(subject, recipients, body)
  }
}
