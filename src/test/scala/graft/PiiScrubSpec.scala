package graft

import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** Planted-shape semantics of the PII scrub (the harness corpus has no
  * PII, so q_pii_scrub verifies the oracle twin on SYNTHESIZED contact
  * cards; this spec pins the rule behavior on hand-written shapes the
  * synthesis doesn't cover — multiple hits, near-misses, idempotence).
  */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(texts: String*): Seq[String] =
    texts.toDF("text").select(TextOps.scrubPii(col("text")).as("s"))
      .as[String].collect().toSeq

  test("each PII shape is replaced by its tag") {
    assert(scrub("contact john.doe+x@mail.example.org today") ==
      Seq("contact <EMAIL> today"))
    assert(scrub("from 192.168.0.1 at dawn") == Seq("from <IP> at dawn"))
    assert(scrub("call 123-456-789-0123 now") == Seq("call <PHONE> now"))
    assert(scrub("ssn 123456789 ok") == Seq("ssn <ID> ok"))
  }

  test("multiple hits in one doc all scrub, order-independent of position") {
    assert(scrub("a@b.co then 10.0.0.1 then 12-345-678-9012 then 9876543210") ==
      Seq("<EMAIL> then <IP> then <PHONE> then <ID>"))
  }

  test("near-misses survive: short numbers, versions, bare domains") {
    val keep = Seq(
      "version 1.2.3 of the lib",   // 3-part dotted — not an IPv4
      "pages 12-34 and 56-78",      // short dashed runs — not a phone
      "order 12345678 shipped",     // 8 digits — below the id floor
      "see example.org for docs",   // domain without local@ — not an email
      "rooms 101-203-305 east",     // 3-3-3 dashed — no 4-digit tail
      "ref 12-345-678 filed",       // 2-3-3 dashed — too short for any form
      "lot (55) 123-4567 bids")     // 2-digit paren group — not an area code
    assert(scrub(keep: _*) == keep)
  }

  test("common NANP phone forms scrub: 3-3-4, parenthesized, +1-prefixed") {
    assert(scrub("call 555-123-4567 now") == Seq("call <PHONE> now"))
    assert(scrub("call (555) 123-4567 now") == Seq("call <PHONE> now"))
    assert(scrub("call (555)123-4567 now") == Seq("call <PHONE> now"))
    assert(scrub("call +1 555 123 4567 now") == Seq("call <PHONE> now"))
    assert(scrub("call +1-555-123-4567 now") == Seq("call <PHONE> now"))
    // All forms in one doc, each consumed exactly once.
    assert(scrub("a 555-123-4567 b (555) 123-4567 c +1 555 123 4567 d 12-345-678-9012 e") ==
      Seq("a <PHONE> b <PHONE> c <PHONE> d <PHONE> e"))
  }

  test("scrub is idempotent (tags never re-match a rule)") {
    val once = scrub("a@b.co 10.0.0.1 12-345-678-9012 9876543210 mixed")
    val twice = once.toDF("text").select(TextOps.scrubPii(col("text")).as("s"))
      .as[String].collect().toSeq
    assert(once == twice)
  }

  test("email scrub runs first: the local part's digits never leak as ids") {
    // 'customer.0123456789@x.example' holds a 10-digit run; id-first
    // ordering would shred it into 'customer.<ID>@x.example' and the
    // email rule would then miss. The fixed order replaces the whole
    // address.
    assert(scrub("mail customer.0123456789@x.example please") ==
      Seq("mail <EMAIL> please"))
  }
}
