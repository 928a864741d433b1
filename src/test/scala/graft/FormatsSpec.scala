package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format matrix beyond parquet: csv, json-lines, orc
  * round-trips on fixture data (SURVEY.md §2-B "sources"; the reference
  * itself supports only GCS JSON objects + a tar.gz sink).
  */
class FormatsSpec extends AnyFunSuite {
  import TestSpark._

  private val formats = Seq("csv", "json", "orc")

  formats.foreach { fmt =>
    test(s"$fmt write/read round-trip preserves rows") {
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory(s"fmt-$fmt").toString
      val src = Tables.nation(spark, sf)
      src.write.option("header", "true").format(fmt).save(s"$base/t")
      val back = spark.read
        .option("header", "true").option("inferSchema", "true")
        .format(fmt).load(s"$base/t")
      assert(back.count() === src.count())
      val expect = src.select($"n_name").as[String].collect().toSet
      val got = back.select($"n_name").as[String].collect().toSet
      assert(got === expect)
    }
  }
}
