package graft

/** Safety net over the whole driver contract: every declared query must run
  * and return rows at sf0.001, every oracle key must have a query, and the
  * flagship entry must satisfy the smoke check. Catches a broken queries-map
  * entry before the driver does. */
class SparkEntrySpec extends SparkSpec {

  // r11: the formerly vacuous-at-oracle-scale queries were reshaped to be
  // non-empty at every SF (q_except → customers-without-events anti-set;
  // q_source_overlap → full source-pair matrix with zero-coalesced counts),
  // so every query must now return rows
  private val mayBeEmpty = Set.empty[String]

  test("every query runs and returns rows at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, sfDir).count()
        if (n > 0 || mayBeEmpty(name)) None else Some(s"$name: 0 rows")
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}")
      }
    }
    assert(failures.isEmpty, s"broken queries:\n  ${failures.mkString("\n  ")}")
  }

  test("oracle keys are a subset of query keys") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("entry satisfies the driver smoke check (rows > 0)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
