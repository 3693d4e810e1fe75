package graft

import org.apache.spark.sql.functions._
import graft.functions.AhoCorasick
import graft.operators.TextAnalysis

class AhoCorasickSpec extends SparkSpec {

  /** Naive all-occurrences count (overlapping included) — the AC contract. */
  private def naiveCounts(text: String, patterns: Seq[String]): (Long, Long) = {
    val per = patterns.map { p =>
      (0 to text.length - p.length).count(i => text.startsWith(p, i)).toLong
    }
    (per.count(_ > 0).toLong, per.sum)
  }

  test("automaton equals naive overlapping-occurrence counts on adversarial fixtures") {
    // suffix patterns, self-bordered patterns, and patterns overlapping
    // each other — the cases fail links and output links exist for
    val cases = Seq(
      ("aaaa", Seq("aa", "aaa", "a")),          // self-border: aa hits 3x
      ("ababab", Seq("ab", "bab", "abab")),     // mutual overlap
      ("slow scan row scan", Seq("scan", "slow scan", "row scan")),
      ("xyz", Seq("q", "zz")),                  // zero matches
      ("mississippi", Seq("iss", "ssi", "sip", "pi", "mississippi")))
    cases.foreach { case (text, pats) =>
      val a = AhoCorasick.build(pats)
      assert(a.countMatches(text) == naiveCounts(text, pats),
        s"mismatch on '$text' / $pats")
    }
    // randomized cross-check over a tiny alphabet (dense match structure)
    val rnd = new scala.util.Random(7)
    val pats = Seq("ab", "ba", "aab", "bba", "abab", "b")
    val a = AhoCorasick.build(pats)
    (1 to 200).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(40) + 1)(if (rnd.nextBoolean()) 'a' else 'b').mkString
      assert(a.countMatches(s) == naiveCounts(s, pats), s"mismatch on '$s'")
    }
  }

  test("shipped blocklist is border-free, so AC counts equal the oracle's replace counts") {
    TextAnalysis.DefaultBlocklist.foreach { p =>
      (1 until p.length).foreach { k =>
        assert(p.take(k) != p.takeRight(k),
          s"pattern '$p' has border length $k — replace-count oracle would diverge")
      }
    }
  }

  test("blocklistScreen: suffix pattern counts ride along; flags match a local recompute") {
    val got = TextAnalysis.blocklistScreen(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = tables.documents.select(col("doc_id"), col("text")).collect().map { r =>
      val t = r.getString(1).trim.toLowerCase
      val (h, o) = naiveCounts(t, TextAnalysis.DefaultBlocklist)
      (r.getLong(0), h, o, if (o > 0) 1L else 0L)
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    assert(got.exists(_._4 == 1L), "fixture should contain blocked docs")
    assert(got.exists(_._4 == 0L), "fixture should contain clean docs")
  }
}
