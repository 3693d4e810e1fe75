package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Analytics

/** Temporary perf probe — not part of the library surface. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, "/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    time("warm") { t.lineitem.count() }
    for (_ <- 1 to 2) {
      val sorted = time("shuffle+sort+persist") {
        val s = t.lineitem.select(col("l_returnflag").cast("string").as("g"),
            col("l_extendedprice").cast("double").as("v"))
          .filter(col("v").isNotNull)
          .repartitionByRange(96, col("g"), col("v"))
          .sortWithinPartitions("g", "v")
          .persist()
        s.count(); s
      }
      val counts = time("counts pass") {
        sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
          it.foreach { r => val g = r.getString(0); m.update(g, m.getOrElse(g, 0L) + 1L) }
          m.iterator.map { case (g, c) => (pid, g, c) }
        }.collect()
      }
      time("fetch pass") {
        val byPid = Map(0 -> Set(("A", 10L)))
        val b = spark.sparkContext.broadcast(byPid)
        sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
          b.value.get(pid) match {
            case None => Iterator.empty
            case Some(want) =>
              val ctr = scala.collection.mutable.HashMap.empty[String, Long]
              it.flatMap { r =>
                val g = r.getString(0)
                val i = ctr.getOrElse(g, 0L); ctr.update(g, i + 1L)
                if (want.contains((g, i))) Some((pid, g, i, r.getDouble(1))) else None
              }
          }
        }.collect()
      }
      println("counts rows: " + counts.length)
      sorted.unpersist(blocking = true)
      time("buffering percentile") {
        t.lineitem.groupBy("l_returnflag")
          .agg(round(expr("percentile(l_extendedprice, 0.5)"), 6)).collect()
      }
      time("full groupPercentiles") { Analytics.groupPercentiles(t).collect() }
    }
    spark.stop()
  }
}
