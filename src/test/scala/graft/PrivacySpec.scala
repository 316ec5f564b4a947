package graft

import graft.operators.Privacy

/** PII redaction semantics: true/false positives, replacement order,
  * running-text count measurement. */
class PrivacySpec extends SparkSpec {
  import sqlContext.implicits._

  private def redactOne(text: String): (String, Long, Long, Long) = {
    val r = Privacy.redactPii(Seq((1L, text)).toDF("id", "t"), "t")
      .select("t_redacted", "n_email", "n_ip", "n_phone").collect().head
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("redactPii: each category replaced with its token and counted") {
    val (red, e, ip, ph) = redactOne(
      "mail bob.smith+x@corp.example.org then 192.168.0.1 then 604-555-1234 done")
    assert(red == "mail <EMAIL> then <IP> then <PHONE> done")
    assert((e, ip, ph) == (1L, 1L, 1L))
  }

  test("redactPii: plain words and free numbers do not false-positive") {
    val cases = Seq(
      "the quick brown fox 42 times",
      "version 1.2 of 3.4.5 rc",          // too few octets for the IP shape
      "item 1234 5678 calls 12-34-56",    // wrong digit-group shapes for phone
      "price 999.999.999.999 overflow")   // octets > 255
    cases.foreach { t =>
      val (red, e, ip, ph) = redactOne(t)
      assert(red == t, s"false positive on: $t -> $red")
      assert((e, ip, ph) == (0L, 0L, 0L), s"nonzero counts on: $t")
    }
  }

  test("redactPii: multiple hits per category all replaced and counted") {
    val (red, e, ip, ph) = redactOne("a@b.co c@d.io at 10.0.0.1 and 10.0.0.2")
    assert(red == "<EMAIL> <EMAIL> at <IP> and <IP>")
    assert((e, ip, ph) == (2L, 2L, 0L))
  }

  test("redactPii: counts measure the running text (email eats its domain before IP pass)") {
    // the email's host ends in digits-dot-digits? no — construct a case where
    // removing the email removes what would otherwise IP-match downstream:
    // 'x@1.2.3.44.com' is one email match; after <EMAIL> no IP remains.
    val (red, e, ip, _) = redactOne("ping x@1.2.3.44.com now")
    assert(red == "ping <EMAIL> now")
    assert(e == 1L && ip == 0L)
  }

  test("redactPii: duplicate category names rejected") {
    val df = Seq((1L, "t")).toDF("id", "t")
    intercept[IllegalArgumentException](
      Privacy.redactPii(df, "t", Seq(("x", "a", "<A>"), ("x", "b", "<B>"))))
    intercept[IllegalArgumentException](Privacy.redactPii(df, "t", Seq.empty))
  }

  test("piiRates: per-group totals and any-PII rate; clean groups report zero") {
    val df = Seq(
      ("web", "write a@b.co and c@d.io today"),   // 2 emails, 1 doc with PII
      ("web", "no pii here"),
      ("book", "call 555-123-4567 sometime"),     // 1 phone
      ("scan", "plain text"))
      .toDF("src", "t")
    val r = Privacy.piiRates(df, "t", "src")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(4), x.getLong(5), x.getDouble(6))).toMap
    // (n_docs, n_email, n_phone, n_docs_pii, pii_rate)
    assert(r("web") == (2L, 2L, 0L, 1L, 0.5), r.toString)
    assert(r("book") == (1L, 0L, 1L, 1L, 1.0), r.toString)
    assert(r("scan") == (1L, 0L, 0L, 0L, 0.0), r.toString)
  }

  test("kAnonymity: groups under k flagged, groups at/over k clean") {
    val df = Seq(
      ("bc", "1990"), ("bc", "1990"), ("bc", "1990"),   // n=3, safe at k=3
      ("ab", "1990"), ("ab", "1990"),                   // n=2, at risk
      ("sk", "1985"))                                   // n=1, at risk
      .toDF("region", "birth_year")
    val r = Privacy.kAnonymity(df, Seq("region", "birth_year"), k = 3)
      .collect().map(x => (x.getString(0), x.getLong(2), x.getInt(3))).toSet
    assert(r == Set(("bc", 3L, 0), ("ab", 2L, 1), ("sk", 1L, 1)), r.toString)
  }

  test("kAnonymity: NULL quasi-identifier values form their own (countable) group") {
    val df = Seq(Some("bc"), None, None).map(v => Tuple1(v)).toDF("region")
    val r = Privacy.kAnonymity(df, Seq("region"), k = 2)
      .collect().map(x => (Option(x.getString(0)), x.getLong(1), x.getInt(2))).toSet
    assert(r == Set((Some("bc"), 1L, 1), (None, 2L, 0)), r.toString)
  }

  test("kAnonymity: k < 2 and empty quasi set rejected") {
    val df = Seq(("a", 1)).toDF("q", "v")
    intercept[IllegalArgumentException](Privacy.kAnonymity(df, Seq("q"), k = 1))
    intercept[IllegalArgumentException](Privacy.kAnonymity(df, Seq.empty, k = 5))
  }

  test("lDiversity: a k-large but homogeneous class is at risk; diversity counts distinct non-NULL values") {
    val df = Seq(
      ("30s", "flu"), ("30s", "flu"), ("30s", "flu"),   // large, homogeneous
      ("40s", "flu"), ("40s", "cold"),                  // small, diverse
      ("50s", null), ("50s", null)                      // all-NULL sensitive
    ).toDF("age", "dx")
    val r = Privacy.lDiversity(df, Seq("age"), "dx", l = 2)
      .collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getInt(3)))
      .toMap
    // the 3-member class is k-anonymous at k=3 yet fully leaks the dx
    assert(r("30s") == (3L, 1L, 1), r.toString)
    assert(r("40s") == (2L, 2L, 0), r.toString)
    // NULLs carry no diversity: l_distinct 0, maximally at risk
    assert(r("50s") == (2L, 0L, 1), r.toString)
  }

  test("lDiversity: degenerate parameters rejected") {
    val df = Seq(("a", "s")).toDF("q", "sens")
    intercept[IllegalArgumentException](Privacy.lDiversity(df, Seq("q"), "sens", l = 1))
    intercept[IllegalArgumentException](Privacy.lDiversity(df, Seq.empty, "sens", l = 2))
    intercept[IllegalArgumentException](Privacy.lDiversity(df, Seq("q", "sens"), "sens", l = 2))
  }

  test("tCloseness: hand-computed TVD per class; a diverse-but-skewed class is flagged") {
    // global: x 4/6, y 2/6. A = {x,x,x,y}: ½(|3/4−2/3|+|1/4−1/3|) = 1/12.
    // B = {x,y}: ½(|1/2−2/3|+|1/2−1/3|) = 1/6 — DIVERSE (l=2) yet at risk
    // at t=0.1: the exact leak t-closeness exists to catch.
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "x"), ("B", "y")).toDF("grp", "s")
    val r = Privacy.tCloseness(df, Seq("grp"), "s", t = 0.1)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getInt(3)))).toMap
    assert(r("A") == ((4L, 0.083333, 0)), r.toString)
    assert(r("B") == ((2L, 0.166667, 1)), r.toString)
  }

  test("tCloseness: absent categories fold in via the identity; NULL sensitive is a category") {
    // global: x 2/3, y 1/3. D = {x,x}: ½(|1−2/3| + pg(y)) = 1/3.
    // E = {y}: ½(|1−1/3| + pg(x)) = 2/3 (x absent from the class).
    val df = Seq(("D", "x"), ("D", "x"), ("E", "y")).toDF("grp", "s")
    val r = Privacy.tCloseness(df, Seq("grp"), "s", t = 0.5)
      .collect().map(x => x.getString(0) ->
        ((x.getDouble(2), x.getInt(3)))).toMap
    assert(r("D") == ((0.333333, 0)), r.toString)
    assert(r("E") == ((0.666667, 1)), r.toString)
    // NULL sensitive values form their own category: global x 1/3, NULL
    // 2/3; F = {x, NULL}: ½(|1/2−1/3|+|1/2−2/3|) = 1/6;
    // G = {NULL}: ½(|1−2/3| + pg(x)) = 1/3
    val withNull = Seq(("F", Some("x")), ("F", None), ("G", None))
      .toDF("grp", "s")
    val rn = Privacy.tCloseness(withNull, Seq("grp"), "s", t = 0.25)
      .collect().map(x => x.getString(0) ->
        ((x.getDouble(2), x.getInt(3)))).toMap
    assert(rn("F") == ((0.166667, 0)), rn.toString)
    assert(rn("G") == ((0.333333, 1)), rn.toString)
  }

  test("tCloseness: degenerate parameters rejected") {
    val df = Seq(("a", "s")).toDF("q", "sens")
    intercept[IllegalArgumentException](Privacy.tCloseness(df, Seq("q"), "sens", t = 0.0))
    intercept[IllegalArgumentException](Privacy.tCloseness(df, Seq("q"), "sens", t = 1.0))
    intercept[IllegalArgumentException](Privacy.tCloseness(df, Seq.empty, "sens", t = 0.2))
    intercept[IllegalArgumentException](Privacy.tCloseness(df, Seq("q", "sens"), "sens", t = 0.2))
  }

  test("tClosenessOrdered: the ICDE'07 worked example — {3k,4k,5k} vs uniform 3k–11k scores 0.375") {
    // Li, Li & Venkatasubramanian ICDE'07 §3: salaries 3k–11k, one record
    // each, three classes of three. {3k,4k,5k} (adjacent low values)
    // scores 0.375; {6k,8k,11k} (spread) scores 1/6 ≈ 0.167 — the
    // paper's point that ordered distance ranks the ADJACENT-skew class
    // as the worse disclosure. Hand check of the third: cum diffs
    // (1+2+3+4+2+3+1+1)/9 / 8 = 17/72 ≈ 0.236111.
    val df = Seq(
      ("c1", 3000), ("c1", 4000), ("c1", 5000),
      ("c2", 6000), ("c2", 8000), ("c2", 11000),
      ("c3", 7000), ("c3", 9000), ("c3", 10000)).toDF("grp", "sal")
    val r = Privacy.tClosenessOrdered(df, Seq("grp"), "sal", t = 0.2)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getInt(3)))).toMap
    assert(r("c1") == ((3L, 0.375, 1)), r.toString)
    assert(r("c2") == ((3L, 0.166667, 0)), r.toString)
    assert(r("c3") == ((3L, 0.236111, 1)), r.toString)
  }

  test("tClosenessOrdered: NULL sensitive excluded from both distributions; m=1 domain scores 0") {
    // NULLs have no spine position: global over non-NULL {1,2} is
    // uniform; class A's NULL row drops from n and from p_class.
    val withNull = Seq(("A", Some(1)), ("A", None), ("B", Some(2)))
      .toDF("grp", "s")
    val rn = Privacy.tClosenessOrdered(withNull, Seq("grp"), "s", t = 0.3)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getInt(3)))).toMap
    assert(rn("A") == ((1L, 0.5, 1)), rn.toString)
    assert(rn("B") == ((1L, 0.5, 1)), rn.toString)
    // a single-value domain has no spine to move mass along
    val flat = Seq(("A", 7), ("A", 7), ("B", 7)).toDF("grp", "s")
    val rf = Privacy.tClosenessOrdered(flat, Seq("grp"), "s", t = 0.3)
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(rf == Map("A" -> 0.0, "B" -> 0.0), rf.toString)
  }

  test("tClosenessOrdered: NULL quasi values form their own class; degenerate parameters rejected") {
    val df = Seq((Some("A"), 1), (None, 2), (None, 3)).toDF("grp", "s")
    val r = Privacy.tClosenessOrdered(df, Seq("grp"), "s", t = 0.5)
      .collect().map(x => (if (x.isNullAt(0)) "<null>" else x.getString(0)) ->
        x.getLong(1)).toMap
    assert(r == Map("A" -> 1L, "<null>" -> 2L), r.toString)
    intercept[IllegalArgumentException](
      Privacy.tClosenessOrdered(df, Seq("grp"), "s", t = 0.0))
    intercept[IllegalArgumentException](
      Privacy.tClosenessOrdered(df, Seq.empty, "s", t = 0.2))
    intercept[IllegalArgumentException](
      Privacy.tClosenessOrdered(df, Seq("grp", "s"), "s", t = 0.2))
  }
}
