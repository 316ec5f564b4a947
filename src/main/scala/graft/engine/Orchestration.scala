package graft.engine

import scala.collection.mutable

/** Non-relational orchestration surface (SURVEY §2.8) — the parts of the
  * reference around the dataflow: YAML config + env credentials
  * (/root/reference/src/wins_transform_staging.py:26-52,69-78), a captured
  * run log returned to the caller (:80-92,292), and a pluggable notifier
  * for the emailed SUCCESS/FAILURE report (:294-319).
  */
object Orchestration {

  /** Minimal flat/2-level YAML subset parser — exactly the shape of the
    * reference's app.yml (scalars and one level of nesting; no lists, no
    * anchors). No external dependency, fail-fast on malformed lines. */
  def parseYamlish(text: String): Map[String, String] = {
    val out = mutable.LinkedHashMap[String, String]()
    var prefix = ""
    text.linesIterator.filter(l => l.trim.nonEmpty && !l.trim.startsWith("#"))
      .foreach { line =>
        val indented = line.startsWith(" ") || line.startsWith("\t")
        val t = line.trim
        val idx = t.indexOf(':')
        require(idx > 0, s"malformed config line: '$t'")
        val k = t.substring(0, idx).trim
        val v = t.substring(idx + 1).trim
        // unquoted values: strip a trailing inline comment — including a
        // value that IS only a comment (`key: # note` means empty in
        // YAML, not the literal comment text); quoted values: require the
        // closing quote (an unbalanced quote fails fast rather than being
        // silently half-stripped)
        val quoted = v.startsWith("\"") || v.startsWith("'")
        val value =
          if (quoted) {
            val q = v.charAt(0)
            val end = v.indexOf(q, 1)
            require(end > 0, s"unbalanced quote in config line: '$t'")
            v.substring(1, end)
          } else if (v.startsWith("#")) ""
          else v.indexOf(" #") match {
            case -1 => v
            case c => v.substring(0, c).trim
          }
        if (!indented) {
          // an explicitly QUOTED empty value is a value (`password: ""`),
          // not a section header — only a bare empty opens a section
          if (value.isEmpty && !quoted) prefix = s"$k."
          else { prefix = ""; out(k) = value }
        } else {
          require(prefix.nonEmpty, s"indented line outside a section: '$t'")
          out(prefix + k) = value
        }
      }
    out.toMap
  }

  /** Credential lookup: env first (the reference reads an INI outside the
    * repo — env is the container-era equivalent), fail fast when absent. */
  def secret(name: String, env: Map[String, String] = sys.env): String =
    env.getOrElse(name, throw new IllegalStateException(s"missing credential: $name"))

  /** Captured run log: the reference attaches a StringIO handler and mails
    * the whole buffer. Same idea, typed. */
  final class RunLog {
    private val lines = mutable.ArrayBuffer[String]()
    def info(msg: String): Unit = lines += s"INFO $msg"
    def error(msg: String): Unit = lines += s"ERROR $msg"
    def dump: String = lines.mkString("\n")
  }

  /** Where the reference sends email (:294-306). Side-effecting boundary —
    * keep implementations trivial and tested only for routing. */
  trait Notifier { def notify(success: Boolean, subject: String, body: String): Unit }

  object ConsoleNotifier extends Notifier {
    def notify(success: Boolean, subject: String, body: String): Unit =
      println(s"[${if (success) "SUCCESS" else "FAILURE"}] $subject\n$body")
  }

  /** SMTP notifier with the reference's exact message contract
    * (/root/reference/src/wins_transform_staging.py:294-306: a raw
    * `Subject:`/`To:` header block, and :310-315: a SUCCESS/FAILURE heading
    * prepended to the run log). The wire transport is injectable —
    * `(host, from, recipients, message) => Unit` — so the formatting and
    * routing logic is spec-testable in a network-less sandbox and the
    * production transport is a three-line `javax.mail`/socket send. */
  final class SmtpNotifier(
      host: String,
      sender: String,
      recipients: Seq[String],
      transport: (String, String, Seq[String], String) => Unit)
    extends Notifier {
    require(recipients.nonEmpty, "SmtpNotifier needs at least one recipient")
    def notify(success: Boolean, subject: String, body: String): Unit = {
      val outcome = if (success) "SUCCESS" else "FAILURE"
      val heading =
        s"$subject $outcome\n This is an automated email from the $subject application\n"
      val msg = s"Subject: $subject \r\nTo: ${recipients.mkString(", ")} \r\n\r\n\r\n$heading$body"
      transport(host, sender, recipients, msg)
    }
  }

  /** Log a table's [[Pipeline.RunReport]] the way the reference logs its
    * per-table counts (:253,263), plus the as-executed layout/skew
    * diagnostics — so the straggler predictor lands in the run log the
    * notifier MAILS, not just in a return value nobody reads. A skew
    * above `skewWarnAt` logs an explicit WARNING line. */
  def logReport(
      log: RunLog, r: Pipeline.RunReport, skewWarnAt: Double = 5.0): Unit = {
    log.info(s"${r.table}: input=${r.inputRows} kept=${r.keptRows}")
    r.rejectsByReason.toSeq.sortBy(_._1).foreach { case (why, n) =>
      log.info(s"${r.table}: rejected $n ($why)")
    }
    r.layout.foreach { l =>
      log.info(s"${r.table}: layout partitions=${l.nPartitions} " +
        s"rows min=${l.minRows} max=${l.maxRows} avg=${l.avgRows} skew=${l.skew}")
      if (l.skew >= skewWarnAt) log.info(
        s"${r.table}: WARNING partition skew ${l.skew} — the slowest task does " +
          s"${l.skew}x the average work and the stage runs at its pace; " +
          "repartition or salt the hot keys")
    }
  }

  /** Run a pipeline body with the reference's report contract: exceptions
    * are captured into the log (the reference swallows them, :289-290 — we
    * additionally surface the outcome in the return value). */
  def reportedRun(notifier: Notifier, subject: String)(body: RunLog => Unit): (Boolean, String) = {
    val log = new RunLog
    val ok =
      try { body(log); true }
      catch { case e: Throwable => log.error(s"run failed: ${e.getMessage}"); false }
    notifier.notify(ok, subject, log.dump)
    (ok, log.dump)
  }
}
