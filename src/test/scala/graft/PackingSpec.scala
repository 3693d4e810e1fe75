package graft

import org.apache.spark.sql.functions._
import graft.operators.{Packing, TextAnalysis}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val contextLen = 64

  private def packed = Packing.packDocuments(tables, contextLen = contextLen)

  test("every document is packed exactly once") {
    val n = tables.documents.count()
    val p = packed
    assert(p.count() == n)
    assert(p.select("doc_id").distinct().count() == n)
  }

  test("no bin exceeds the context length unless it holds a single oversized doc") {
    val bad = packed.groupBy("shard", "bin_idx")
      .agg(sum("n_tokens").as("used"), count(lit(1)).as("n_docs"))
      .filter(col("used") > contextLen && col("n_docs") > 1)
    assert(bad.isEmpty, bad.collect().mkString(", "))
  }

  test("bin indices are contiguous from zero within every shard") {
    packed.groupBy("shard")
      .agg(min("bin_idx").as("lo"), max("bin_idx").as("hi"),
        countDistinct("bin_idx").as("n"))
      .collect().foreach { r =>
        assert(r.getLong(r.fieldIndex("lo")) == 0L)
        assert(r.getLong(r.fieldIndex("n")) == r.getLong(r.fieldIndex("hi")) + 1,
          s"holes in bin numbering: $r")
      }
  }

  test("packing wastes bounded padding (next-fit quality, not just validity)") {
    // next-fit guarantee: any two CONSECUTIVE bins hold > contextLen
    // together (else the second bin's first doc would have fit in the
    // first), so total bins < 2·(total tokens/contextLen) + shards
    val p = packed
    val bins = p.select("shard", "bin_idx").distinct().count()
    val total = p.agg(sum("n_tokens")).head().getLong(0)
    val shards = p.select("shard").distinct().count()
    assert(bins <= 2 * (total / contextLen) + shards + 1,
      s"bins=$bins total=$total — worse than the next-fit bound")
  }

  test("packing is deterministic under input partitioning and row order") {
    val base = packed.collect().map(_.toSeq).toSeq
    val shuffled = tables.withTable("documents",
      tables.documents.orderBy(rand(42)).repartition(7))
    val again = Packing.packDocuments(shuffled, contextLen = contextLen)
      .collect().map(_.toSeq).toSeq
    assert(again == base)
  }

  test("chunking covers every token with the declared overlap") {
    val chunkTokens = 12
    val overlap = 4
    val stride = chunkTokens - overlap
    val docs = tables.documents.limit(60)
    val toks = docs
      .select(col("doc_id"), graft.operators.TextAnalysis.tokens(col("text")).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val chunks = graft.operators.Packing
      .chunkDocuments(tables.withTable("documents", docs), chunkTokens, overlap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    toks.filter(_._2.nonEmpty).foreach { case (id, tk) =>
      val cs = chunks(id).sortBy(_._2)
      // chunk k starts at k*stride and is exactly the slice of the tokens
      cs.foreach { case (_, k, text, n) =>
        val expect = tk.slice((k * stride).toInt, (k * stride).toInt + chunkTokens)
        assert(text == expect.mkString(" "), s"doc $id chunk $k")
        assert(n == expect.size)
      }
      // full coverage: the last chunk reaches the final token
      val (_, lastK, _, lastN) = cs.last
      assert(lastK * stride + lastN == tk.size, s"doc $id tail uncovered")
      // no chunk is a strict suffix of its predecessor (it adds tokens)
      assert(cs.forall { case (_, k, _, n) => k == 0 || n > overlap },
        s"doc $id has a redundant tail chunk")
    }
    assert(chunks.nonEmpty)
  }

  test("chunking edge docs: <= overlap tokens -> one whole chunk; empty -> none") {
    val t = tables.withTable("documents",
      Seq((1L, "a b c"), (2L, ""), (3L, "   ")).toDF("doc_id", "text"))
    val got = graft.operators.Packing.chunkDocuments(t, chunkTokens = 8, overlap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, 0L, "a b c")))
  }

  test("packing plans exactly one hash shuffle (the shard exchange)") {
    val plan = planOf(Packing.packDocuments(tables, contextLen = contextLen))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1,
      s"expected exactly the shard exchange, found $hashExchanges:\n$plan")
  }

  test("passageDupScores flags exactly the passages shared across documents") {
    // 40 tokens → 2 non-overlapping 32-token passages per doc (32 + 8)
    val words = (0 until 40).map(i => s"w$i")
    val docA = words.mkString(" ")
    val docB = (words.take(32) ++ (0 until 8).map(i => s"x$i")).mkString(" ") // shares passage 0 with A
    val docC = (0 until 40).map(i => s"y$i").mkString(" ")                    // shares nothing
    val docs = Seq((1L, docA, "en", "s"), (2L, docB, "en", "s"), (3L, docC, "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val t = tables.withTable("documents", docs)
    val got = Packing.passageDupScores(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((2L, 1L, 0.5)), s"doc 1: ${got(1L)}")
    assert(got(2L) == ((2L, 1L, 0.5)), s"doc 2: ${got(2L)}")
    assert(got(3L) == ((2L, 0L, 0.0)), s"doc 3: ${got(3L)}")
  }

  test("passageDupScores on the corpus is consistent with the chunker") {
    val chunks = Packing.chunkDocuments(tables, 32, overlap = 0)
      .select("doc_id", "chunk_text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sharedTexts = chunks.groupBy(_._2)
      .filter(_._2.map(_._1).distinct.length >= 2).keySet
    val expected = chunks.groupBy(_._1).map { case (d, cs) =>
      d -> (cs.length.toLong, cs.count(c => sharedTexts(c._2)).toLong)
    }
    val got = Packing.passageDupScores(tables).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("packing per-doc token counts match textStats") {
    val fromPack = packed.select("doc_id", "n_tokens")
    val fromStats = TextAnalysis.textStats(tables)
      .select(col("doc_id"), col("n_tokens"))
    assert(fromPack.exceptAll(fromStats).isEmpty &&
      fromStats.exceptAll(fromPack).isEmpty)
  }

  // driver-side replica of cdcChunks' boundary rule
  private def cdcSizes(toks: Seq[String], maskBits: Int = 3): Seq[Int] = {
    val modulus = 1L << maskBits
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    var cur = 0
    toks.foreach { w =>
      cur += 1
      val h = graft.functions.HashImpl.rollingHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(w))
      if (((h % modulus) + modulus) % modulus == 0) { sizes += cur; cur = 0 }
    }
    if (cur > 0) sizes += cur
    sizes.toSeq
  }

  test("cdcChunks matches a driver-side boundary recompute") {
    val got = Packing.cdcChunks(tables).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val docs = tables.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
      .filter(_._2.nonEmpty)
    assert(got.size == docs.length)
    docs.foreach { case (id, toks) =>
      val sizes = cdcSizes(toks)
      val (n, mx, av) = got(id)
      assert(n == sizes.length && mx == sizes.max, s"doc $id")
      assert(av == math.round(sizes.sum.toDouble / sizes.length * 1e6) / 1e6, s"doc $id avg")
    }
  }

  test("cdcChunks boundaries are insertion-stable; fixed-size chunking is not") {
    // the CDC selling point: inserting one token re-chunks ONLY the chunk
    // it lands in — every boundary after it stays put
    val toks = tables.documents.orderBy("doc_id").select("text").head()
      .getString(0).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    assert(toks.length >= 20, "fixture doc too short")
    val before = cdcSizes(toks)
    val ins = toks.take(toks.length / 2) ++ Seq("zzinserted") ++ toks.drop(toks.length / 2)
    val after = cdcSizes(ins)
    // boundary positions measured from the END are unchanged past the
    // insertion chunk; suffix chunk sequences must therefore agree
    val commonSuffix = before.reverse.zip(after.reverse).takeWhile { case (a, b) => a == b }.length
    // everything after the touched chunk agrees: at most 2 leading chunks
    // (the split/merged one and its successor if the new token IS a
    // boundary) may differ
    assert(commonSuffix >= before.length - 2,
      s"CDC must localize the edit: before=$before after=$after")
    // contrast: fixed windows shift every boundary after the insertion
    val fixedBefore = toks.grouped(8).map(_.length).toSeq
    val fixedAfter = ins.grouped(8).map(_.length).toSeq
    assert(fixedBefore.size != fixedAfter.size ||
      fixedBefore.reverse.zip(fixedAfter.reverse).exists { case (a, b) => a != b },
      "fixed-size chunking should NOT be insertion-stable on this fixture")
  }

  test("removeBoilerplate drops same-source repeats, keeps cross-source ones, preserves order") {
    // 32 tokens → 2 non-overlapping 16-token passages per doc
    val banner = (0 until 16).map(i => s"nav$i")
    def body(p: String) = (0 until 16).map(i => s"$p$i")
    val docs = Seq(
      (1L, (banner ++ body("a")).mkString(" "), "en", "s1"), // banner hot in s1
      (2L, (banner ++ body("b")).mkString(" "), "en", "s1"),
      (3L, (body("c") ++ banner).mkString(" "), "en", "s2"), // banner unique within s2 → kept
      (4L, (body("d") ++ body("e")).mkString(" "), "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val t = tables.withTable("documents", docs)
    val got = Packing.removeBoilerplate(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
    assert(got(1L) == ((2L, 1L, body("a").mkString(" "), 16L)), s"doc 1: ${got(1L)}")
    assert(got(2L) == ((2L, 1L, body("b").mkString(" "), 16L)), s"doc 2: ${got(2L)}")
    assert(got(3L) == ((2L, 0L, (body("c") ++ banner).mkString(" "), 32L)), s"doc 3: ${got(3L)}")
    assert(got(4L) == ((2L, 0L, (body("d") ++ body("e")).mkString(" "), 32L)), s"doc 4: ${got(4L)}")
  }

  test("removeBoilerplate fully-boilerplate doc reassembles to the empty string") {
    val banner = (0 until 16).map(i => s"nav$i").mkString(" ")
    val docs = Seq((1L, banner, "en", "s"), (2L, banner, "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Packing.removeBoilerplate(tables.withTable("documents", docs)).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3), r.getLong(4))).toMap
    assert(got(1L) == ((1L, "", 0L)) && got(2L) == ((1L, "", 0L)), got.toString)
  }

  test("removeBoilerplate is consistent with the chunker on the corpus") {
    val srcOf = tables.documents.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = Packing.chunkDocuments(tables, 16, overlap = 0)
      .select("doc_id", "chunk_idx", "chunk_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val hot = chunks.groupBy(c => (srcOf(c._1), c._3))
      .filter(_._2.map(_._1).distinct.length >= 2).keySet
    val expected = chunks.groupBy(_._1).map { case (d, cs) =>
      val kept = cs.sortBy(_._2).filterNot(c => hot((srcOf(d), c._3)))
      d -> (cs.length.toLong, (cs.length - kept.length).toLong, kept.map(_._3).mkString(" "))
    }
    val got = Packing.removeBoilerplate(tables).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got == expected)
    assert(got.values.exists(_._2 > 0L), "fixture should contain same-source repeats")
  }

  test("removeBoilerplate broadcasts the hot-passage set (no corpus-corpus shuffle join)") {
    val plan = planOf(Packing.removeBoilerplate(tables))
    assert(plan.contains("BroadcastHashJoin"), s"hot set not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }

  test("paddingWasteAudit matches a local recompute; bucketing beats global-max padding") {
    val lens = tables.documents.collect().map { r =>
      val t = r.getAs[String]("text").trim.toLowerCase.split("\\s+").count(_.nonEmpty)
      t.toLong
    }.filter(_ > 0)
    def cap(l: Long) = Seq(16L, 32L, 64L, 128L, 256L).find(l <= _).getOrElse(512L)
    val want = lens.groupBy(cap).toSeq.sortBy(_._1).map { case (c, ls) =>
      val n = ls.length.toLong; val s = ls.sum
      (c, n, s, c * n - s)
    }
    val gmax = lens.max; val gn = lens.length.toLong; val gsum = lens.sum
    val naive = (gmax * gn - gsum).toDouble / (gmax * gn)
    val got = graft.operators.Packing.paddingWasteAudit(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want, s"engine ${got.toSeq} vs naive $want")
    val rows = graft.operators.Packing.paddingWasteAudit(tables).collect()
    val bucketWaste = rows.map(r => r.getLong(3)).sum.toDouble /
      rows.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(bucketWaste < naive, "bucketed batching must beat global-max padding")
    assert(math.abs(rows.head.getDouble(5) - naive) < 1e-6)
  }
}
