package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Ops, Orchestration}

class OrchestrationSpec extends AnyFunSuite {

  test("parseYamlish: flat keys, one nesting level, quotes, comments — the app.yml shape") {
    val cfg = Orchestration.parseYamlish(
      """# comment
        |staging_path: /data/staging
        |feature_services:
        |  reserves: "abc123"
        |  hydro: 'def456'
        |smtp_host: mail.example
        |""".stripMargin)
    assert(cfg == Map(
      "staging_path" -> "/data/staging",
      "feature_services.reserves" -> "abc123",
      "feature_services.hydro" -> "def456",
      "smtp_host" -> "mail.example"))
  }

  test("parseYamlish: inline comments stripped from unquoted values; unbalanced quote fails fast") {
    val cfg = Orchestration.parseYamlish(
      "smtp_host: mail.example  # prod relay\nquoted: \"with # inside\"\n")
    assert(cfg == Map("smtp_host" -> "mail.example", "quoted" -> "with # inside"))
    intercept[IllegalArgumentException](
      Orchestration.parseYamlish("bad: \"unbalanced\n"))
    // a quoted empty string is a VALUE, not a section header; a
    // comment-only value behaves like a bare empty (section opener /
    // vanishing key) — the comment text must never leak into the value
    val edge = Orchestration.parseYamlish(
      "password: \"\"\nsec: # commented section header\n  a: 1\nhost: # set via env\n")
    assert(edge("password") == "")
    assert(edge("sec.a") == "1")
    assert(!edge.contains("host") && !edge.values.exists(_.contains("set via env")))
  }

  test("secret: env lookup fails fast when absent") {
    assert(Orchestration.secret("U", Map("U" -> "x")) == "x")
    intercept[IllegalStateException](Orchestration.secret("MISSING", Map()))
  }

  test("reportedRun: captures log + failure, notifies with outcome") {
    var delivered: Option[(Boolean, String)] = None
    val n = new Orchestration.Notifier {
      def notify(ok: Boolean, subject: String, body: String): Unit =
        delivered = Some((ok, body))
    }
    val (ok, log) = Orchestration.reportedRun(n, "wins run") { l =>
      l.info("step 1"); throw new RuntimeException("boom")
    }
    assert(!ok && log.contains("INFO step 1") && log.contains("ERROR run failed: boom"))
    assert(delivered.contains((false, log)))
  }

  test("SmtpNotifier: reference message contract (header block, heading, routing) via injected transport") {
    var sent: Option[(String, String, Seq[String], String)] = None
    val n = new Orchestration.SmtpNotifier(
      "smtp.gov.local", "noreply@local", Seq("a@local", "b@local"),
      (host, from, to, msg) => sent = Some((host, from, to, msg)))
    n.notify(success = false, "Quick WINS STAGING", "line1\nline2")
    val (host, from, to, msg) = sent.get
    assert(host == "smtp.gov.local" && from == "noreply@local" && to == Seq("a@local", "b@local"))
    // raw header block exactly as the reference formats it (:300), heading
    // prepended to the log (:312-315), recipients comma-joined in To:
    assert(msg.startsWith("Subject: Quick WINS STAGING \r\nTo: a@local, b@local \r\n\r\n\r\n"))
    assert(msg.contains("Quick WINS STAGING FAILURE\n This is an automated email"))
    assert(msg.endsWith("line1\nline2"))
    intercept[IllegalArgumentException](
      new Orchestration.SmtpNotifier("h", "f", Nil, (_, _, _, _) => ()))
  }

  test("logReport: counts, reasons, layout and the skew WARNING land in the mailed log") {
    import graft.engine.{Orchestration, Pipeline}
    val log = new Orchestration.RunLog
    val rep = Pipeline.RunReport("RRR", 100, 90,
      Map("dup" -> 6, "ref" -> 4),
      Some(Pipeline.LayoutStats(8, 1, 60, 12.5, 4.8)))
    Orchestration.logReport(log, rep, skewWarnAt = 5.0)
    val out = log.dump
    assert(out.contains("RRR: input=100 kept=90"))
    assert(out.contains("rejected 6 (dup)") && out.contains("rejected 4 (ref)"))
    assert(out.contains("partitions=8") && out.contains("skew=4.8"))
    assert(!out.contains("WARNING")) // 4.8 < 5.0 threshold
    val log2 = new Orchestration.RunLog
    Orchestration.logReport(log2,
      rep.copy(layout = Some(Pipeline.LayoutStats(8, 1, 600, 12.5, 48.0))))
    assert(log2.dump.contains("WARNING partition skew 48.0"))
    // layoutless report (empty input) logs counts only, no layout line
    val log3 = new Orchestration.RunLog
    Orchestration.logReport(log3, rep.copy(layout = None))
    assert(!log3.dump.contains("layout"))
  }
}

class SaltedJoinSpec extends SparkSpec {
  import sqlContext.implicits._

  test("saltedJoin: identical result to the plain join for inner and left, incl. unmatched keys") {
    val left = (1 to 200).map(i => (s"k${i % 5}", i)).toDF("k", "v") // heavy skew: 5 keys
    val right = Seq(("k0", "a"), ("k1", "b"), ("k2", "c"), ("kX", "z")).toDF("rk", "rv")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Int, String)] =
      df.select("k", "v", "rv").collect()
        .map(r => (r.getString(0), r.getInt(1), String.valueOf(r.get(2)))).toSeq.sorted
    for (jt <- Seq("inner", "left")) {
      val plain = rows(left.join(right, left("k") === right("rk"), jt))
      val salted = rows(Ops.saltedJoin(left, right, "k", "rk", salts = 8, joinType = jt))
      assert(salted == plain)
    }
  }

}
