package graft.sources

import graft.SparkSpec
import graft.meta.DataDictionary
import graft.core.DataPackage
import org.apache.spark.sql.types._

class SheetSourceSpec extends SparkSpec {
  import spark.implicits._

  test("sheet -> DataFrame: header slugify + empty-header drop + ragged rows") {
    val svc = new SheetSource.InMemorySheetService
    svc.writeCells("ws", Seq(
      Seq("Órgão Superior", "", "Valor Total"),
      Seq("MF", "ignored", "10"),
      Seq("MEC", "ignored"))) // ragged: missing last cell
    val df = SheetSource.toDf(spark, svc, "ws")
    assert(df.columns.toSeq == Seq("orgao_superior", "valor_total"))
    val rows = df.as[(String, Option[String])].collect().toSet
    assert(rows == Set(("MF", Some("10")), ("MEC", None)))
  }

  test("DataFrame -> sheet roundtrip") {
    val svc = new SheetSource.InMemorySheetService
    val df = Seq((1L, "x"), (2L, null.asInstanceOf[String])).toDF("id", "v")
    SheetSource.fromDf(df, svc, "out")
    val cells = svc.readCells("out")
    assert(cells.head == Seq("id", "v"))
    assert(cells.tail.toSet == Set(Seq("1", "x"), Seq("2", "")))
  }

  test("DataDictionary renders fields, frictionless types, comments") {
    val schema = StructType(Seq(
      StructField("id", LongType).withComment("the key"),
      StructField("name", StringType),
      StructField("when", TimestampType).withComment("event time")))
    val entries = DataDictionary.entries("countries", schema)
    assert(entries.map(e => (e.field, e.`type`, e.description)) == Seq(
      ("id", "integer", "the key"),
      ("name", "string", ""),
      ("when", "datetime", "event time")))
    val md = DataDictionary.toMarkdown("countries", schema)
    assert(md.contains("## countries") && md.contains("| id | integer | the key |"))
    val asDf = DataDictionary.toDf(spark, "countries", schema)
    assert(asDf.count() == 3)
  }

  test("DataPackage zip envelope bundles csv parts + descriptor") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-zip").toString
    val df = Seq((1L, "a")).toDF("id", "v").coalesce(1)
    DataPackage.write(df, tmp, "res", Seq("id"))
    val zipPath = DataPackage.zip(tmp, "res")
    val zf = new java.util.zip.ZipFile(zipPath.toFile)
    try {
      val names = zf.entries().asIterator()
      val set = scala.collection.mutable.Set[String]()
      while (names.hasNext) set += names.next().getName
      assert(set.contains("datapackage.json"))
      assert(set.exists(_.endsWith(".csv")))
    } finally zf.close()
  }
}
