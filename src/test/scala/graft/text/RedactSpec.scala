package graft.text

import graft.SparkSpecBase

class RedactSpec extends SparkSpecBase {

  import spark.implicits._

  private def redactOne(text: String): (Long, Long, Long, String) = {
    val r = Redact.redactPii(Seq(1L -> text).toDF("id", "text"), "id", "text")
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
  }

  test("emails redact with count") {
    val (e, i, p, t) = redactOne("write to jane.doe+x@corp.example.org today")
    assert((e, i, p) === (1L, 0L, 0L))
    assert(t === "write to <EMAIL> today")
  }

  test("ipv4 and phone redact with counts") {
    val (e, i, p, t) = redactOne("host 192.168.0.1 tel 555-0123 and 10.0.0.7")
    assert((e, i, p) === (0L, 2L, 1L))
    assert(t === "host <IP> tel <PHONE> and <IP>")
  }

  test("sequencing: digits inside an email never count as a phone") {
    val (e, i, p, t) = redactOne("mail 555-0123@x.example.com only")
    assert((e, i, p) === (1L, 0L, 0L))
    assert(t === "mail <EMAIL> only")
  }

  test("ip redacts before phone so dotted groups never split-match") {
    val (e, i, p, t) = redactOne("addr 123.456.789.012 end")
    assert((e, i, p) === (0L, 1L, 0L))
    assert(t === "addr <IP> end")
  }

  test("clean text passes through untouched") {
    val (e, i, p, t) = redactOne("the quick brown fox 42 times")
    assert((e, i, p) === (0L, 0L, 0L))
    assert(t === "the quick brown fox 42 times")
  }

  test("phone never fires inside longer digit-dash runs (year ranges)") {
    val (e, i, p, t) = redactOne("fiscal 2023-2024 grew; window 12345-6789 too")
    assert((e, i, p) === (0L, 0L, 0L))
    assert(t === "fiscal 2023-2024 grew; window 12345-6789 too")
  }

  test("adjacent phones separated by one space both redact") {
    // \b is zero-width: the separator is not consumed by the first match
    val (e, i, p, t) = redactOne("call 555-0123 555-0124 now")
    assert((e, i, p) === (0L, 0L, 2L))
    assert(t === "call <PHONE> <PHONE> now")
  }

  test("phone requires a word boundary: letter-glued digits stay") {
    val (_, _, p, t) = redactOne("sku X555-0123 is not a phone")
    assert(p === 0L)
    assert(t === "sku X555-0123 is not a phone")
  }

  test("multiple occurrences all redact (global replace)") {
    val (e, _, _, t) = redactOne("a@b.co then c@d.org")
    assert(e === 2L)
    assert(t === "<EMAIL> then <EMAIL>")
  }
}
