package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Differential-test runner: executes generated reference-grammar SQL
  * (tools/gen_fuzz_sql.py) through [[Engine.sql]] and dumps each result for
  * the DuckDB comparison (tools/check_fuzz.py). Exercises the SQL surface
  * generically — Catalyst parsing, analysis, and execution — beyond the
  * fixed SparkEntry queries.
  *
  * Usage: runMain graft.FuzzRunner <sfDir> <queriesJson> <outDir>
  */
object FuzzRunner {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, queriesJson, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = Engine(spark, sfDir)
    new java.io.File(outDir).mkdirs()

    // minimal JSON object parser for {"name": "sql", ...} (flat, string->string)
    val text = new String(Files.readAllBytes(Paths.get(queriesJson)), "UTF-8")
    val entry = """"(fuzz_\d+)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    val queries = entry.findAllMatchIn(text).map { m =>
      m.group(1) -> m.group(2).replace("\\\"", "\"").replace("\\\\", "\\")
    }.toSeq

    var failed = 0
    queries.foreach { case (name, sql) =>
      try engine.sql(sql).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch {
        case e: Throwable =>
          failed += 1
          System.err.println(s"[fuzz] $name FAILED: ${e.getMessage.take(200)}\n  $sql")
      }
    }
    println(s"[fuzz] ran ${queries.size} queries, $failed failed")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
