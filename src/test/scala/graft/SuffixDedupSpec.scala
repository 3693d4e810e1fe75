package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SuffixDedup}

class SuffixDedupSpec extends SparkSpec {
  import spark.implicits._

  test("prefix-doubling equals the direct substring derivation on the corpus") {
    val docs = tables.documents
    // the WIDENING branch explicitly: the shipped entry takes the direct
    // form below the r16 cost switch's threshold, so the exactness pin
    // must name the above-threshold path
    val doubled = SuffixDedup.duplicateSubstringsWidening(docs, minLen = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = SuffixDedup.duplicateSubstringsDirect(docs, minLen = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(doubled.nonEmpty, "corpus has no 32-char cross-doc duplicates?")
    assert(doubled == direct,
      s"doubling != direct: only-doubled=${(doubled diff direct).take(3)} " +
        s"only-direct=${(direct diff doubled).take(3)}")
  }

  test("catches a duplicate SHORTER than the 8-token shingle window that q_dup_spans misses") {
    // a 3-token, 44-char planted duplicate: far under the 8-token window
    val planted = "intercontinental ballistic reconfiguration x"
    assert(planted.length == 44 && planted.split(" ").length == 4)
    val prefixA = "alpha beta gamma delta epsilon zeta eta theta " // 46 chars
    val docs = Seq(
      (0L, prefixA + planted + " one two three four five six seven eight"),
      (1L, "nine ten eleven twelve " + planted + " thirteen fourteen fifteen sixteen"),
      (2L, "completely unrelated filler text with nothing shared at all here"))
      .toDF("doc_id", "text")
    // token-shingle spans (w=8) are blind to it: no 8-token run repeats
    val shingleSpans = Dedup.duplicateSpans(
      tables.withTable("documents", docs)).collect()
    assert(shingleSpans.isEmpty,
      s"fixture broken: q_dup_spans sees ${shingleSpans.mkString(";")}")
    // character-granular detection finds it, at the exact offsets
    val out = SuffixDedup.duplicateSubstrings(docs, minLen = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet == Set(0L, 1L), s"docs: ${out.mkString(";")}")
    val span0 = out.find(_._1 == 0L).get
    val span1 = out.find(_._1 == 1L).get
    // doc 0: planted starts at prefixA.length + 1 (1-based). The maximal
    // duplicate region is exactly the planted phrase plus the shared
    // trailing space boundary — the span must COVER the planted text and
    // must not extend into text the docs don't share (>= a one-char slack
    // each side for the shared leading/trailing space).
    def covers(span: (Long, Long, Long), start1: Int): Boolean =
      span._2 <= start1 && span._2 + span._3 >= start1 + planted.length
    assert(covers(span0, prefixA.length + 1), s"doc0 span $span0")
    assert(covers(span1, "nine ten eleven twelve ".length + 1), s"doc1 span $span1")
    assert(span0._3 <= planted.length + 2 && span1._3 <= planted.length + 2,
      s"span overshoots the shared region: $span0 $span1")
  }

  test("sharded mode is row-identical to the full run, including cross-shard duplicates") {
    val docs = tables.documents
    val full = SuffixDedup.duplicateSubstrings(docs, minLen = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sharded = SuffixDedup.duplicateSubstringsSharded(docs, minLen = 32,
        shards = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full.nonEmpty)
    assert(sharded == full,
      s"sharded != full: only-sharded=${(sharded diff full).take(3)} " +
        s"only-full=${(full diff sharded).take(3)}")
    // the fixture must actually exercise CROSS-shard unification: running
    // each shard in isolation (no representative exchange) must MISS spans
    // whose occurrences hash into different shards — i.e. the equality
    // above is not vacuous
    val isolated = (0 until 3).map { s =>
      SuffixDedup.duplicateSubstrings(
        docs.filter(pmod(xxhash64($"doc_id"), lit(3)) === s), minLen = 32)
    }.reduce(_.unionByName(_))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(isolated != full,
      "fixture has no cross-shard duplicates — unification untested")
  }

  test("cutDuplicateSpans removes exactly the spans; clean docs pass through") {
    val shared = ("z" * 10) + " the same sixty-four character region repeated verbatim here " + ("q" * 10)
    val doc0 = "left padding words before " + shared
    val doc2 = "completely unrelated text with nothing shared at all in this one"
    val docs = Seq((0L, doc0), (1L, shared + " right padding words after"),
      (2L, doc2)).toDF("doc_id", "text")
    val spans = SuffixDedup.duplicateSubstrings(docs, minLen = 32)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val out = SuffixDedup.cutDuplicateSpans(docs, minLen = 32)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // doc 2 has no duplicates: passes through byte-identical
    assert(out(2L)._3 == 0)
    assert(out(2L)._4 == java.security.MessageDigest.getInstance("MD5")
      .digest(doc2.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    // doc 0: exactly the detected span is gone, and the cleaned text is
    // the original with that [start, start+len) slice removed
    val (s0, l0) = spans(0L)
    assert(out(0L)._3 == l0, s"cut ${out(0L)._3} chars, span is $l0")
    val expectClean = doc0.substring(0, s0.toInt - 1) +
      doc0.substring((s0 + l0 - 1).toInt)
    assert(out(0L)._4 == java.security.MessageDigest.getInstance("MD5")
      .digest(expectClean.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(out(0L)._2 == expectClean.length)
  }

  test("consecutive duplicate starts merge into ONE maximal span") {
    // two docs share one long region → every start inside it is marked,
    // and the island merge must emit a single span per doc, not a span
    // per position
    val shared = ("z" * 10) + " the same sixty-four character region repeated verbatim here " + ("q" * 10)
    val docs = Seq(
      (0L, "left padding words before " + shared),
      (1L, shared + " right padding words after"))
      .toDF("doc_id", "text")
    val out = SuffixDedup.duplicateSubstrings(docs, minLen = 32).collect()
    assert(out.length == 2, s"expected one span per doc: ${out.mkString(";")}")
    assert(out.forall(_.getLong(2) >= shared.length),
      s"span shorter than the shared region: ${out.mkString(";")}")
  }
}
