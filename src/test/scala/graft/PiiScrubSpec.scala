package graft

import graft.operators.TextAnalysis

/** PII scrub: hand-checked tag replacement + counts, pattern-order
  * guarantees, idempotence, and the no-PII identity. */
class PiiScrubSpec extends SparkTestBase {

  private def scrub(texts: (Long, String)*): Map[Long, (String, Int, Int, Int, Int)] = {
    import spark.implicits._
    TextAnalysis.scrubPii(texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))))
      .toMap
  }

  test("hand-checked replacement and counts (n_url, n_email, n_ip, n_phone)") {
    val got = scrub(
      (0L, "mail me at a.b+c@test.org today"),
      (1L, "see https://x.io/p?q=1 and http://y.com"),
      (2L, "call +1 555 123 4567 now"),
      (3L, "host 192.168.1.42 is down"),
      (4L, "plain text with no pii at all"))
    assert(got(0L) === (("mail me at <EMAIL> today", 0, 1, 0, 0)))
    assert(got(1L) === (("see <URL> and <URL>", 2, 0, 0, 0)))
    assert(got(2L) === (("call <PHONE> now", 0, 0, 0, 1)))
    assert(got(3L) === (("host <IP> is down", 0, 0, 1, 0)))
    assert(got(4L) === (("plain text with no pii at all", 0, 0, 0, 0)))
  }

  test("IP adjacent to a phone number survives (IP pattern applies before the greedy phone run)") {
    val got = scrub((0L, "call +1 555 123 4567 10.0.0.1"))
    assert(got(0L)._1 === "call <PHONE> <IP>")
  }

  test("URL innards are never half-scrubbed (URL pattern applies first)") {
    val got = scrub((0L, "profile https://site.com/u/me@mail.com/42 end"))
    assert(got(0L)._1 === "profile <URL> end")
    assert(got(0L)._2 === 1, "counted as a URL")
    // the email inside the URL IS counted by the raw-text email counter —
    // counts flag occurrences on the original text, replacement owns order
    assert(got(0L)._3 === 1)
  }

  test("scrub is idempotent: tags contain no scrubable material") {
    import spark.implicits._
    val once = TextAnalysis.scrubPii(
      Seq((0L, "a@b.co https://x.io +1 555 123 4567 10.0.0.1")).toDF("doc_id", "text"),
      "doc_id", "text")
      .select($"doc_id", $"clean_text".as("text"))
    val twice = TextAnalysis.scrubPii(once, "doc_id", "text").collect().head
    assert(twice.getString(1) === "<EMAIL> <URL> <PHONE> <IP>")
    assert((2 to 5).map(twice.getInt) === Seq(0, 0, 0, 0))
  }
}
