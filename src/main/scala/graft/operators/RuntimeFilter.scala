package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.BloomFunctions
import graft.sources.Tables

/** EXPLICIT Bloom runtime-filter semi join — the Bloom-pruned scan
  * pattern (Bloom 1970; the shape Spark's own `InjectRuntimeFilter`
  * plants under AQE) expressed as an operator a pipeline controls:
  * build the filter over the SMALL side's join keys once, prune the
  * corpus-sized scan with a codegen'd `might_contain` probe BEFORE any
  * shuffle, then finish with the exact join on the survivors.
  *
  * Why explicit when the optimizer already injects one: the planner's
  * filter lives inside a single query's execution — a corpus pipeline
  * prunes the same 100 TB scan against the same small key set across
  * MANY queries and days (decontamination lists, tombstoned doc ids,
  * licensed-source allowlists), so the filter wants to be an ARTIFACT
  * (built once, broadcast bytes, reused) rather than a per-query
  * side effect. At scale the win is shuffle bytes: the probe drops
  * ~99% of non-matching rows map-side for a few KB of broadcast state,
  * where the exact semi join would shuffle (or at best broadcast-probe)
  * every scanned row.
  *
  * This is a VERIFICATION row, so it also pays for what production
  * would skip: the plain exact semi join runs beside the pre-filtered
  * one and the row carries two pinned flags — `bloom_sound` (the
  * pre-filtered aggregate equals the plain one: Bloom filters never
  * false-negative, a disagreement means the build/probe hashing split)
  * and `fp_rate_ok` (observed false-positive rate within 3× the sizing
  * target). The oracle replays the exact semi join and pins both flags
  * at 1, so a regression in either expression fails the driver hash. */
object RuntimeFilter {

  /** Revenue by return flag for lineitems of low-balance suppliers
    * (s_acctbal < 1500 — present at every SF; the fixture corpus has no
    * negative balances), computed through the Bloom pre-filter, with
    * the soundness + false-positive audits described above. `numBits` is
    * sized 10 bits/key (~0.8% theoretical fp at the derived optimal
    * hash count); the audit bound is 3%. */
  def bloomPrefilterRevenue(t: Tables): DataFrame = {
    val small = t.supplier.filter(col("s_acctbal") < 1500)
      .select(col("s_suppkey").as("k"))
    // bounded driver scalars: |small| (filter sizing) and the serialized
    // filter itself (numBits/8 bytes — KBs) — the probe expression
    // requires a CONSTANT filter, which is the point: these bytes are
    // the reusable artifact
    // FLOOR the sizing at 64 expected keys: 10 bits/key keeps the derived
    // optimal hash count at round(10·ln2) = 7 for ANY small-side size.
    // Sizing for the literal count in the degenerate corner is measured-
    // wrong: nItems=1 → numBits=64 → k=optimal(64,1)=44 hashes saturating
    // a single word, 22% observed fp at the fixture. 80 bytes of floor
    // is free; the flag below is the regression tripwire either way.
    val nItems = math.max(64L, small.count())
    val numBits = nItems * 10L
    val bloomBytes = small
      .agg(BloomFunctions.bloomAgg(xxhash64(col("k")), nItems, numBits)
        .as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val probe: Column =
      BloomFunctions.mightContain(lit(bloomBytes), xxhash64(col("l_suppkey")))

    def revenueAgg(rows: DataFrame): DataFrame = rows
      .join(small.hint("broadcast"), col("l_suppkey") === col("k"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        // order-free soundness checksum: per-row cents are exact longs, so
        // the sum is identical under ANY partition/summation order — the
        // rounded double `revenue` is NOT (two differently-planned sums
        // can land on opposite sides of a half-cent boundary; r16 advice)
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long")).as("_cents"))

    val pre = t.lineitem.filter(probe).localCheckpoint()
    val viaBloom = revenueAgg(pre)
    val plain = revenueAgg(t.lineitem)
    // soundness: never-false-negative means the two aggregates are equal
    // row-for-row; compare via full outer join on the group key, on the
    // exact row count + integer checksum (never the rounded double)
    val sound = viaBloom.select(col("l_returnflag"), col("n_rows").as("_nb"),
        col("_cents").as("_cb"))
      .join(plain.select(col("l_returnflag"), col("n_rows").as("_np"),
        col("_cents").as("_cp")), Seq("l_returnflag"), "full_outer")
      .agg(min(when(col("_nb") === col("_np") && col("_cb") === col("_cp"), 1)
        .otherwise(0)).as("_sound"))
    // fp audit: bloom-passing rows that the exact join rejects, over all
    // truly-non-matching scanned rows
    val totals = t.lineitem.agg(count(lit(1)).as("_total"))
    val exactMatched = plain.agg(sum("n_rows").as("_matched"))
    val fp = pre.agg(count(lit(1)).as("_pre"))
      .crossJoin(broadcast(totals)).crossJoin(broadcast(exactMatched))
      .select(when((col("_pre") - col("_matched")) <=
        (col("_total") - col("_matched")) * 0.03, 1).otherwise(0).as("_fpok"))
    viaBloom
      .crossJoin(broadcast(sound)).crossJoin(broadcast(fp))
      .select(col("l_returnflag"), col("n_rows"), col("revenue"),
        col("_sound").cast("int").as("bloom_sound"),
        col("_fpok").cast("int").as("fp_rate_ok"))
      .orderBy("l_returnflag")
  }
}
