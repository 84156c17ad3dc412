package graft

import java.nio.file.{Files => JFiles}

import org.apache.spark.sql.types._

import graft.sources.Files

/** Round-trip specs for the CSV / JSON-lines / binary file sources. */
class FilesSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("csv: declared schema, header, fail-fast round trip") {
    val dir = JFiles.createTempDirectory("graft_csv").toString
    Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "name", "score")
      .write.option("header", "true").csv(s"$dir/out")
    val back = Files.csv(spark, s"$dir/out", schema)
    assert(back.schema == schema)
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 0.5), (2L, "b", 1.5)))
  }

  test("jsonLines: declared schema round trip") {
    val dir = JFiles.createTempDirectory("graft_json").toString
    Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "name", "score")
      .write.json(s"$dir/out")
    val back = Files.jsonLines(spark, s"$dir/out", schema)
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 0.5), (2L, "b", 1.5)))
  }

  test("binaryFiles: content and length surface per file, glob filters") {
    val dir = JFiles.createTempDirectory("graft_bin")
    JFiles.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    JFiles.write(dir.resolve("b.txt"), Array[Byte](9))
    val all = Files.binaryFiles(spark, dir.toString)
    assert(all.count() == 2)
    val bins = Files.binaryFiles(spark, dir.toString, glob = "*.bin")
      .select("length", "content").collect()
    assert(bins.length == 1)
    assert(bins.head.getLong(0) == 3L)
    assert(bins.head.getAs[Array[Byte]](1).toSeq == Seq[Byte](1, 2, 3))
  }
}
