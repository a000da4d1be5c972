package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.TestSpark

class IngestBadRecordsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("qty", IntegerType),
    StructField("name", StringType)))

  private def withCsv(body: String)(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_badrec")
    try {
      val p = dir.resolve("d.csv")
      java.nio.file.Files.writeString(p, body)
      f(p.toString)
    } finally {
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  private val body =
    "id,qty,name\n" +
      "1,5,ok\n" +
      "2,NOT_INT,typedrift\n" + // castable-count, bad cell
      "3,7\n" +                 // short row
      "4,1,ok,EXTRA\n" +        // long row
      "5,2,ok\n"

  test("DROPMALFORMED: structural drops are row-global, cast drops are projection-scoped") {
    withCsv(body) { p =>
      // full projection: the failing qty cast is referenced → row drops
      val full = Ingest.readCsvDropMalformed(spark, p, schema)
        .collect().map(_.getLong(0)).toSet
      assert(full == Set(1L, 5L),
        s"structural AND referenced-cast errors drop: $full")
      // id-only projection: qty never converts, so the type-drift row
      // SURVIVES — while the structural (token-count) drops still
      // apply. This asymmetry is the measured Spark contract the
      // Ingest scaladoc documents; row-fatal type drift needs the
      // PERMISSIVE + corrupt-column policy instead.
      val idOnly = Ingest.readCsvDropMalformed(spark, p, schema)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(idOnly == Set(1L, 2L, 5L),
        s"cast verdicts follow the projection: $idOnly")
    }
  }

  test("PERMISSIVE dead-letters the raw text of every malformed line") {
    withCsv(body) { p =>
      // Spark refuses a query referencing ONLY the corrupt column on
      // the lazily-parsed frame — cache first (documented contract)
      val df = Ingest.readCsvPermissive(spark, p, schema).cache()
      try {
        assert(df.count() == 5, "permissive drops nothing")
        val bad = df.filter(col("_corrupt_record").isNotNull)
          .select("_corrupt_record").collect().map(_.getString(0)).toSet
        assert(bad == Set("2,NOT_INT,typedrift", "3,7", "4,1,ok,EXTRA"),
          s"raw malformed lines must be preserved verbatim: $bad")
        // clean rows parse normally alongside
        assert(df.filter(col("_corrupt_record").isNull)
          .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 5L))
      } finally df.unpersist(blocking = false)
    }
  }
}
