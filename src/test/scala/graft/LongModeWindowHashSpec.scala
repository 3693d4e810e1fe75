package graft

import graft.functions.{HashImpl, LongMode}
import graft.operators.SuffixDedup
import org.apache.spark.sql.functions._

/** Direct contracts for the two r17 custom expressions: the
  * primitive-long deterministic mode aggregate (label propagation's
  * plurality) and the Karp–Rabin window-hash kernel (the duplicate-
  * substring prefilter). Both are also covered indirectly by their
  * operators' oracle rows; these pin the expression-level semantics. */
class LongModeWindowHashSpec extends SparkSpec {

  test("longMode: plurality wins; ties break to the LOWEST value") {
    import spark.implicits._
    val df = Seq(
      (1L, 5L), (1L, 5L), (1L, 3L),            // group 1: 5 wins by count
      (2L, 9L), (2L, 2L), (2L, 9L), (2L, 2L),  // group 2: tie 9/2 → 2
      (3L, 7L)                                  // group 3: singleton
    ).toDF("g", "v")
    val got = df.groupBy("g").agg(LongMode.longMode(col("v")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 5L, 2L -> 2L, 3L -> 7L), got.toString)
  }

  test("longMode: matches Spark's deterministic mode on a hashed corpus column") {
    // cross-check against the built-in it replaced (same tie semantics,
    // boxed buffer) over real data with genuine ties
    val df = tables.lineitem.select(col("l_suppkey").cast("long").as("g"),
      (col("l_partkey") % 7).cast("long").as("v"))
    val ours = df.groupBy("g").agg(LongMode.longMode(col("v")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val theirs = df.groupBy("g").agg(mode(col("v"), deterministic = true).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ours == theirs)
  }

  test("longMode: partial buffers merge across repartitionings; zero key is ordinary") {
    import spark.implicits._
    // 0L must behave like any key (the buffer marks empty slots by zero
    // COUNT, not zero key)
    val rows = (1 to 500).map(i => (i % 3).toLong -> (i % 2).toLong)
    val df = rows.toDF("g", "v")
    val a = df.repartition(1).groupBy("g").agg(LongMode.longMode(col("v")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = df.repartition(17).groupBy("g").agg(LongMode.longMode(col("v")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "merge order changed the plurality")
    assert(a.values.forall(v => v == 0L || v == 1L))
  }

  test("windowHashes: position-aligned with the substring derivation, equal windows ⟺ equal hashes") {
    import spark.implicits._
    val L = 8
    val docs = Seq(
      (1L, "abcdefghijkl mnopqrstuv abcdefghijkl"),
      (2L, "zzzzzzzzzzzzzzzz"),
      (3L, "short"),                       // < L: no windows
      (4L, "exactly8"),                    // == L: one window
      (5L, "café résumé café résumé"), // multibyte BMP
      (6L, "a😀bcdefgh😀ij a😀bcdefgh") // non-BMP (emoji)
    ).toDF("doc_id", "text")
    val viaKernel = docs
      .select(col("doc_id"),
        posexplode(graft.functions.HashFunctions.windowHashes(col("text"), L))
          .as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("h"))
    val viaSubstr = docs
      .filter(length(col("text")) >= L)
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(1, length(text) - ${L - 1}), i -> substring(text, i, $L))"))
          .as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("g"))
    val joined = viaKernel.join(viaSubstr, Seq("doc_id", "p"), "full_outer")
    // total alignment: every kernel position has a substring and vice versa
    assert(joined.filter(col("h").isNull || col("g").isNull).count() == 0,
      "window grid misaligned with substring positions")
    // equal windows ⟺ equal hashes (no collision expected at this size,
    // and the planted repeats MUST collide)
    val pairs = joined.select("g", "h").distinct().collect()
    val byG = pairs.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).distinct)
    assert(byG.values.forall(_.size == 1), "same window hashed differently")
    val byH = pairs.groupBy(_.getLong(1)).view.mapValues(_.map(_.getString(0)).distinct)
    assert(byH.values.forall(_.size == 1), "different windows collided in the fixture")
  }

  test("windowHashes kernel: short/empty inputs and the rolling recurrence") {
    assert(HashImpl.windowHashesArr("", 4).isEmpty)
    assert(HashImpl.windowHashesArr("abc", 4).isEmpty)
    assert(HashImpl.windowHashesArr("abcd", 4).length == 1)
    // rolling equals from-scratch at every position
    val s = "the quick brown fox jumps over the lazy dog"
    val L = 6
    val rolled = HashImpl.windowHashesArr(s, L)
    val scratch = (0 to s.length - L).map(i => HashImpl.windowHashesArr(s.substring(i, i + L), L)(0))
    assert(rolled.toSeq == scratch, "rolling recurrence diverges from direct hashing")
  }

  test("duplicateSubstrings direct form is unchanged by the hash prefilter on a planted corpus") {
    import spark.implicits._
    // two docs share a 40-char run; a third repeats a substring only
    // WITHIN itself (must NOT count toward minDocs=2 distinct docs)
    val shared = "0123456789abcdefghijklmnopqrstuvwxyzABCD"
    val docs = Seq(
      (1L, s"prefix one $shared tail one"),
      (2L, s"totally different start $shared other end"),
      (3L, ("samesamesamesamesamesamesamesamesamesame" * 2) + " unique")
    ).toDF("doc_id", "text")
    val spans = SuffixDedup.duplicateSubstrings(docs, minLen = 32, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = spans.groupBy(_._1)
    assert(byDoc.keySet == Set(1L, 2L), s"expected spans only in docs 1,2: ${spans.toSeq}")
    // each span must cover the shared run (40 chars ≥ one 32-window run)
    assert(spans.forall(_._3 >= 40), spans.toSeq.toString)
  }
}
