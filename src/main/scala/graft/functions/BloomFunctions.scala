package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column wrappers over Spark's OWN Bloom-filter expressions — the pair
  * `InjectRuntimeFilter` plants under AQE (BloomFilterAggregate builds
  * the filter as a mergeable aggregate, BloomFilterMightContain probes
  * it codegen'd). Exposed here so a PIPELINE can build the filter
  * explicitly, persist/broadcast it, and reuse it across queries and
  * stages — the planner's automatic runtime filter lives and dies inside
  * one query's DPP window, which is exactly too narrow for a corpus
  * pipeline that prunes the same 100 TB scan against the same small key
  * set many times (decontamination lists, tombstoned doc ids, licensed
  * source allowlists).
  *
  * Determinism: the filter's bit array is an OR-merge of per-partition
  * inserts — order-free — and both the build and the probe hash through
  * the same path (insert and probe take the caller's `xxhash64` longs),
  * so a given key set always yields the same bytes and the same
  * probe verdicts.
  *
  * Both sides must feed the SAME representation: hash the key with
  * `functions.xxhash64` (codegen'd) on the build side AND the probe
  * side. */
object BloomFunctions {

  /** Aggregate: Bloom filter over a LONG column (pre-hashed keys), sized
    * `numBits` for `nItems` expected insertions (Spark derives the
    * optimal hash count). Returns the serialized filter as binary —
    * collect the 1-row aggregate and splice it back as a literal for
    * [[mightContain]] (the probe requires a constant/scalar filter). */
  def bloomAgg(hashedKey: Column, nItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hashedKey),
      Literal(nItems), Literal(numBits)).toAggregateExpression())

  /** Probe: true iff the serialized filter (a binary literal) might
    * contain the pre-hashed key. Codegen'd; never false-negative. */
  def mightContain(bloomBinary: Column, hashedKey: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloomBinary),
      ColumnBridge.expression(hashedKey)))
}
