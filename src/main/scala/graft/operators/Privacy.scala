package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions
import graft.sources.Tables

/** Privacy / release-audit operators — the checks and mechanisms a corpus
  * goes through before stats (or the data itself) leave the pipeline:
  * re-identification risk audits and noisy aggregate release. Companions
  * to the PII-redaction row (§2 26c): that one scrubs the text, these
  * govern what the AGGREGATES reveal.
  */
object Privacy {

  /** K-ANONYMITY AUDIT (Sweeney 2002 — the standard re-identification
    * risk measure): treat (lang, source, length-band) as the quasi-
    * identifier and count, for each k, the equivalence classes (and the
    * documents in them) with fewer than k members — the records an
    * attacker can single out by quasi-identifiers alone. The release
    * rule this feeds: suppress or generalize groups below the k
    * threshold before publishing per-group stats.
    *
    * Integer counting end to end (no float anywhere); the length band is
    * explicit CASE banding (the q_pad_waste discipline). One group-keyed
    * aggregation over the corpus, then ≤|ks| scans of the group-
    * cardinality table. */
  def kAnonymityAudit(t: Tables, ks: Seq[Int] = Seq(2, 5, 10)): DataFrame = {
    val banded = t.documents.select(col("lang"), col("source"),
      when(col("n_chars") <= 100, 100L).when(col("n_chars") <= 200, 200L)
        .when(col("n_chars") <= 400, 400L).otherwise(800L).as("len_band"))
    val groups = banded.groupBy("lang", "source", "len_band")
      .agg(count(lit(1)).as("_n"))
      .localCheckpoint() // one total + one scan per k read it
    val totals = groups.agg(count(lit(1)).as("n_groups_total"),
      sum(col("_n")).as("n_docs_total"))
    val perK = ks.map { k =>
      groups.filter(col("_n") < k)
        .agg(coalesce(count(lit(1)), lit(0L)).as("n_groups_at_risk"),
          coalesce(sum(col("_n")), lit(0L)).as("n_docs_at_risk"))
        .select(lit(k.toLong).as("k"), col("n_groups_at_risk"),
          col("n_docs_at_risk"))
    }.reduce(_.unionByName(_))
    perK.crossJoin(broadcast(totals))
      .select(col("k"), col("n_groups_at_risk"), col("n_docs_at_risk"),
        col("n_groups_total"), col("n_docs_total"))
      .orderBy("k")
  }

  /** LAPLACE-NOISED COUNT RELEASE (the Dwork et al. 2006 mechanism —
    * sensitivity-1 counts + Laplace(1/ε) noise; disjoint groups compose
    * in parallel, so the whole table costs one ε): per (lang, source),
    * the true document count next to its noised release and the noise
    * drawn. The RANDOMNESS SOURCE IS DELIBERATELY SEEDED — the inverse-
    * CDF draw reads a hash of the group key (the suite's determinism
    * discipline, same pattern as the stubbed media codecs): the
    * MECHANISM (inverse CDF, sensitivity calibration, composition
    * accounting) is the real, tested artifact, while a production
    * deployment must swap the hash for a secure RNG — with a seeded
    * source the formal DP guarantee is void (noise is recomputable).
    * The true count is emitted here because this is the calibration
    * AUDIT; the release view drops it.
    *
    * Float discipline: u = (pmod(hash, 1e6)+0.5)/1e6 (never 0 or 1);
    * the inverse CDF is one ln() (round-6 per precedent), everything
    * else IEEE-exact. Group-cardinality rows only. */
  def dpNoisyCounts(t: Tables, epsilon: Double = 1.0): DataFrame = {
    require(epsilon > 0, s"dpNoisyCounts: epsilon must be positive, got $epsilon")
    val b = 1.0 / epsilon
    val g = t.documents.groupBy("lang", "source").agg(count(lit(1)).as("n_true"))
    val h = HashFunctions.rollingHash64(concat_ws("|", col("lang"), col("source")))
    val withU = g
      .withColumn("_ui", pmod(h, lit(1000000L)))
      .withColumn("_u", (col("_ui").cast("double") + lit(0.5)) / lit(1000000.0))
    val noise = when(col("_u") < 0.5, lit(b) * log(lit(2.0) * col("_u")))
      .otherwise(lit(-b) * log(lit(2.0) * (lit(1.0) - col("_u"))))
    withU.withColumn("_noise", noise)
      .select(col("lang"), col("source"), col("n_true"),
        round(col("_noise"), 6).as("noise"),
        round(col("n_true") + col("_noise"), 6).as("n_noisy"))
      .orderBy("lang", "source")
  }

  /** L-DIVERSITY AUDIT (Machanavajjhala et al. ICDE'06 — the attribute-
    * disclosure fix k-anonymity misses: a group can be k-anonymous yet
    * leak its sensitive value if every member SHARES it): per quasi-
    * identifier group (nation, market segment, account-balance band —
    * the linkage-attack granularity), the number of DISTINCT sensitive
    * values (order priority) observed; for each l threshold, how many
    * groups and order rows fall below distinct-l. Both this and
    * [[kAnonymityAudit]] feed the same release rule — generalize or
    * suppress failing groups before publishing.
    *
    * The balance band is floor(acctbal / 50.0) on the raw double —
    * identical input doubles + identical division + identical floor in
    * both engines (boundaries only at exact multiples of 50, which
    * divide exactly). Integer counting throughout; one QI-keyed
    * aggregation over customer⋈orders (broadcast customer dim onto the
    * fact scan), then ≤|ls| scans of the group-cardinality table. */
  def lDiversityAudit(t: Tables, ls: Seq[Int] = Seq(2, 3, 5)): DataFrame = {
    val joined = t.orders
      .select(col("o_custkey").as("c_custkey"), col("o_orderpriority"))
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"),
        col("c_mktsegment"),
        floor(col("c_acctbal") / 50.0).cast("int").as("bal_band"))),
        Seq("c_custkey"))
    val groups = joined.groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(countDistinct("o_orderpriority").as("_l"), count(lit(1)).as("_n"))
      .localCheckpoint() // one total + one scan per l read it
    val totals = groups.agg(count(lit(1)).as("n_groups_total"),
      sum(col("_n")).as("n_rows_total"))
    val perL = ls.map { l =>
      groups.filter(col("_l") < l)
        .agg(coalesce(count(lit(1)), lit(0L)).as("n_groups_at_risk"),
          coalesce(sum(col("_n")), lit(0L)).as("n_rows_at_risk"))
        .select(lit(l.toLong).as("l"), col("n_groups_at_risk"),
          col("n_rows_at_risk"))
    }.reduce(_.unionByName(_))
    perL.crossJoin(broadcast(totals))
      .select(col("l"), col("n_groups_at_risk"), col("n_rows_at_risk"),
        col("n_groups_total"), col("n_rows_total"))
      .orderBy("l")
  }
}
