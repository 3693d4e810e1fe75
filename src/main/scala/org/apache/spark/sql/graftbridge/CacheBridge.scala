package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{SparkSession => ClassicSparkSession}

/** Bridge to the session's CacheManager (`private[sql]` in Spark 4.x) —
  * lets specs assert that operators documented with an eager cache
  * lifecycle (SetSimilarity.jaccardSelfJoin, Dedup.lshVerifiedPairs)
  * really release every Dataset cache before returning, instead of
  * accumulating block-manager residency across calls in a long-lived
  * session. */
object CacheBridge {
  /** True iff no Dataset/`persist` entries remain registered. Local-
    * checkpoint blocks are RDD-level and tracked by the ContextCleaner,
    * not the CacheManager, so they don't (and shouldn't) count here. */
  def noDatasetCaches(spark: SparkSession): Boolean =
    spark.asInstanceOf[ClassicSparkSession].sharedState.cacheManager.isEmpty
}
