package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.StructType
import graft.sources.JsonlCorpus

class JsonlCorpusSpec extends SparkSpec {

  test("tolerant read: good lines parse, malformed lines quarantine, nothing dies") {
    val dir = Files.createTempDirectory("graft_jsonl_spec_")
    Files.writeString(Paths.get(dir.toString, "part-0.jsonl"),
      """{"doc_id": 1, "text": "hello world", "lang": "en"}
        |this line is not json at all {{{
        |{"doc_id": 2, "text": "bonjour", "lang": "fr"}
        |{"doc_id": "not-a-number", "text": "type mismatch", "lang": "xx"}
        |""".stripMargin)
    val schema = StructType.fromDDL("doc_id BIGINT, text STRING, lang STRING")
    val df = JsonlCorpus.read(spark, dir.toString, schema)
    val clean = JsonlCorpus.clean(df).collect()
    val corrupt = JsonlCorpus.corrupt(df).collect()
    assert(clean.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(corrupt.length == 2) // the non-JSON line and the type-mismatch line
    assert(corrupt.exists(_.getString(0).contains("not json")))
  }

  test("round-trips the documents table losslessly") {
    val docs = tables.documents
    val dir = Files.createTempDirectory("graft_jsonl_rt_").toString
    docs.write.mode("overwrite").json(dir)
    val back = JsonlCorpus.clean(JsonlCorpus.read(spark, dir, docs.schema))
    assert(back.count() == docs.count())
    assert(JsonlCorpus.corrupt(JsonlCorpus.read(spark, dir, docs.schema)).count() == 0)
    val a = docs.select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = back.select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }
}
