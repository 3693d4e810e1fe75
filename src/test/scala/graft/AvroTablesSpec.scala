package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.AvroTables

class AvroTablesSpec extends SparkSpec {

  test("orders round-trip through Avro container files losslessly") {
    val dir = Files.createTempDirectory("avro_rt").toString
    val orders = tables.orders
    AvroTables.write(orders, dir)
    val back = AvroTables.read(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      orders.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val key = orders.schema.fieldNames.head
    val a = orders.orderBy(key).collect().map(_.toSeq).toSeq
    val b = back.orderBy(key).collect().map(_.toSeq).toSeq
    assert(b == a, "round-tripped rows must be value-identical, timestamps included")
  }

  test("nulls, every supported type, and multi-partition writes survive the trip") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i", IntegerType),
      StructField("d", DoubleType),
      StructField("f", FloatType),
      StructField("b", BooleanType),
      StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("ts", TimestampType),
      StructField("dt", DateType)))
    val ts = java.sql.Timestamp.valueOf("2021-06-01 12:34:56.123456")
    val rows = Seq(
      Row(1L, 7, 3.5, 2.25f, true, "héllo", Array[Byte](1, 2, 3), ts,
        java.sql.Date.valueOf("2020-02-29")),
      Row(2L, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = Files.createTempDirectory("avro_types").toString
    AvroTables.write(df, dir)
    // one container file per input partition — the parallel-sink shape
    val parts = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".avro"))
    assert(parts == 2, s"expected 2 part files, got $parts")
    val back = AvroTables.read(spark, dir).orderBy("id").collect()
    assert(back.length == 2)
    val r1 = back(0)
    assert(r1.getLong(0) == 1L && r1.getInt(1) == 7 && r1.getDouble(2) == 3.5 &&
      r1.getFloat(3) == 2.25f && r1.getBoolean(4) && r1.getString(5) == "héllo")
    assert(r1.getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3))
    assert(r1.getTimestamp(7) == ts, s"micros must survive: ${r1.getTimestamp(7)}")
    assert(r1.getDate(8) == java.sql.Date.valueOf("2020-02-29"))
    val r2 = back(1)
    assert(r2.getLong(0) == 2L && (1 to 8).forall(r2.isNullAt))
  }

  test("the written files are standard Avro object-container files (magic bytes + schema header)") {
    val dir = Files.createTempDirectory("avro_magic").toString
    AvroTables.write(tables.region, dir)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).minBy(_.getName)
    val head = Files.readAllBytes(part.toPath).take(4)
    assert(head.sameElements(Array[Byte]('O', 'b', 'j', 1)),
      "container files must start with the Avro magic Obj\\x01")
  }
}
