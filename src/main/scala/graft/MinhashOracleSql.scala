package graft

import graft.functions.HashImpl

/** DuckDB oracle SQL for the MinHash-LSH queries — an INDEPENDENT
  * re-derivation of the fixed-seed hash arithmetic in portable SQL, so the
  * band-join candidate generation itself (not just its output shape) is
  * hash-verified against a second engine.
  *
  * The kernels are public arithmetic (FNV-1a 64 over the shingle
  * characters, splitmix64 finalizer, per-position mix with seed-derived
  * constants, FNV fold over signature row-groups for band keys — see
  * [[graft.functions.HashImpl]]); DuckDB has no native 64-bit wrapping
  * multiply, so products run as HUGEINT (int128) with an explicit 32-bit
  * split mod 2^64. mix64 is staged through projection columns (z1/z2/z3) —
  * inlining the whole finalizer as one expression re-evaluates shared
  * subtrees ~128× (measured: 58 s → 2.5 s at sf0.01). The 64 per-position
  * constants mix64(seed + j) are seed-derived at generation time with the
  * same public mixer the engine uses. Values cross into SQL as unsigned
  * (HUGEINT) and convert to signed BIGINT exactly where the engine
  * compares as signed (signature MIN, emitted band keys).
  *
  * Caveats mirrored from the kernel contract: ASCII text only (the fused
  * kernel hashes UTF-16 units, this SQL hashes code points — identical for
  * ASCII, property-tested on the engine side), and documents with ZERO
  * tokens are absent from the SQL signature relation while the kernel
  * gives them all-sentinel signatures (they'd pair only with other empty
  * docs; the corpus has none at any SF — checked, and harmless for the
  * queries' ≥-threshold outputs unless two empty docs coexist). */
object MinhashOracleSql {

  private val M64 = "18446744073709551616" // 2^64
  private val HALF = "9223372036854775808" // 2^63
  private def u(x: Long): String = java.lang.Long.toUnsignedString(x)
  private val FnvOff = u(0xcbf29ce484222325L)
  private val FnvPrime = u(0x100000001b3L)
  private val C1 = u(0x9e3779b97f4a7c15L)
  private val C2 = u(0xbf58476d1ce4e5b9L)
  private val C3 = u(0x94d049bb133111ebL)

  /** (a*b) mod 2^64 via 32-bit split — each HUGEINT product stays < 2^65. */
  private def mulmod(a: String, b: String): String =
    s"(((($a) % 4294967296) * (($b) % 4294967296) + " +
      s"((((($a) // 4294967296) * (($b) % 4294967296) + " +
      s"(($a) % 4294967296) * (($b) // 4294967296)) % 4294967296) * 4294967296)) % $M64)"

  // splitmix64 staged as three projection steps over short column refs
  private def mixStage1(x: String) = s"((($x) + $C1) % $M64)"
  private def mixStage2(z1: String) = mulmod(s"xor($z1, $z1 >> 30)", C2)
  private def mixStage3(z2: String) = mulmod(s"xor($z2, $z2 >> 27)", C3)
  private def mixOut(z3: String) = s"xor($z3, $z3 >> 31)"

  private def signed(x: String) =
    s"(CASE WHEN ($x) >= $HALF THEN ($x) - $M64 ELSE ($x) END)"
  private def unsigned(x: String) =
    s"(CASE WHEN ($x) < 0 THEN CAST(($x) AS HUGEINT) + $M64 ELSE CAST(($x) AS HUGEINT) END)"

  /** The 64 per-position constants mix64(seed + j), exactly as the
    * signature kernel derives them (HashImpl.minhashText). */
  private def kjValues(k: Int, seed: Long): String =
    (0 until k).map(j => s"($j, CAST(${u(HashImpl.mix64(seed + j))} AS HUGEINT))")
      .mkString(", ")

  private val fnvFold =
    s"list_reduce(list_prepend(CAST($FnvOff AS HUGEINT), " +
      "list_transform(string_split(s, ''), c -> CAST(unicode(c) AS HUGEINT))), " +
      s"(acc, c) -> ${mulmod("xor(acc, c)", FnvPrime)})"

  private val bandFold =
    s"list_reduce(list_prepend(xor(CAST($FnvOff AS HUGEINT), CAST(band AS HUGEINT)), sigu), " +
      s"(acc, u) -> ${mulmod("xor(acc, u)", FnvPrime)})"

  /** Shared CTE chain: tokens → w=2 shingles (1-token docs emit the
    * whole-doc shingle, matching the kernel) → FNV+mix64 base hash →
    * 64-position signature (min over shingles, SIGNED compare) → 16 band
    * keys (FNV fold over 4-position row-groups) → band-collision candidate
    * pairs → signature-agreement estimate. */
  private def sigCtes(k: Int, bands: Int, seed: Long): String = {
    val rows = k / bands
    s"""toks AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '') AS tk FROM documents),
sh0 AS (SELECT doc_id, tk, unnest(range(1, greatest(len(tk), 2))) AS i FROM toks WHERE len(tk) >= 1),
sh AS (SELECT DISTINCT doc_id, CASE WHEN len(tk) >= 2 THEN tk[i] || ' ' || tk[i+1] ELSE tk[1] END AS s FROM sh0),
h0 AS (SELECT doc_id, $fnvFold AS hraw FROM sh),
h1 AS (SELECT doc_id, ${mixStage1("hraw")} AS z1 FROM h0),
h2 AS (SELECT doc_id, ${mixStage2("z1")} AS z2 FROM h1),
h3 AS (SELECT doc_id, ${mixStage3("z2")} AS z3 FROM h2),
hb AS (SELECT doc_id, ${mixOut("z3")} AS base FROM h3),
ks(j, kj) AS (VALUES ${kjValues(k, seed)}),
v1 AS (SELECT doc_id, j, ${mixStage1("xor(base, kj)")} AS z1 FROM hb CROSS JOIN ks),
v2 AS (SELECT doc_id, j, ${mixStage2("z1")} AS z2 FROM v1),
v3 AS (SELECT doc_id, j, ${mixStage3("z2")} AS z3 FROM v2),
sig AS (SELECT doc_id, j, min(${signed(mixOut("z3"))}) AS sv FROM v3 GROUP BY doc_id, j),
sgl AS (SELECT doc_id, list(sv ORDER BY j) AS sigl FROM sig GROUP BY doc_id),
bnd0 AS (SELECT doc_id, band, list_transform(sigl[band*$rows + 1 : band*$rows + $rows], v -> ${unsigned("v")}) AS sigu FROM sgl CROSS JOIN (SELECT unnest(range(0, $bands)) AS band)),
b0 AS (SELECT doc_id, band, $bandFold AS braw FROM bnd0),
b1 AS (SELECT doc_id, band, ${mixStage1("braw")} AS z1 FROM b0),
b2 AS (SELECT doc_id, band, ${mixStage2("z1")} AS z2 FROM b1),
b3 AS (SELECT doc_id, band, ${mixStage3("z2")} AS z3 FROM b2),
bk AS (SELECT doc_id, band, ${signed(mixOut("z3"))} AS band_key FROM b3),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bk a JOIN bk b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
est AS (SELECT doc_a, doc_b, round(sum(CASE WHEN sa.sv = sb.sv THEN 1 ELSE 0 END) / $k.0, 6) AS est_jaccard FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b AND sa.j = sb.j GROUP BY doc_a, doc_b)"""
  }

  /** Oracle for q_dedup_minhash ([[graft.operators.Dedup.minhashCandidates]]
    * defaults: w=2, k=64, bands=16, minEstJaccard=0.2). */
  def minhashCandidates(k: Int = 64, bands: Int = 16, seed: Long = 42L,
                        minEst: Double = 0.2): String =
    s"WITH ${sigCtes(k, bands, seed)} " +
      s"SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= $minEst " +
      "ORDER BY doc_a, doc_b"

  /** Oracle for q_dedup_lsh_verified
    * ([[graft.operators.Dedup.lshVerifiedPairs]] defaults: candidates at
    * est ≥ 0.2, exact w=2-shingle Jaccard ≥ 0.5 on candidates only). */
  def lshVerifiedPairs(k: Int = 64, bands: Int = 16, seed: Long = 42L,
                       minEst: Double = 0.2, minJaccard: Double = 0.5): String =
    s"""WITH ${sigCtes(k, bands, seed)},
ssz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
cpairs AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= $minEst),
inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common FROM cpairs c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b AND a.s = b.s GROUP BY c.doc_a, c.doc_b)
SELECT doc_a, doc_b, round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard FROM inter JOIN ssz sa ON sa.doc_id = doc_a JOIN ssz sb ON sb.doc_id = doc_b WHERE n_common / (sa.sz + sb.sz - n_common) >= $minJaccard ORDER BY doc_a, doc_b"""
}
