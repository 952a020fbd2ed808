package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{RollingHash, RollingHashExpr}
import graft.operators.CsvExtract

class IoSpec extends SparkSpec {
  import spark.implicits._

  test("DataPackage round trip: typed schema survives CSV") {
    val tmp = Files.createTempDirectory("graft-dp").toString
    val df = Seq(
      (1L, "a", 1.5, true),
      (2L, "b", 2.5, false)).toDF("id", "name", "score", "active")
    DataPackage.write(df, tmp, "res", Seq("id"))

    val json = Files.readString(java.nio.file.Paths.get(s"$tmp/datapackage.json"))
    assert(json.contains("\"primaryKey\": [\"id\"]"))
    assert(json.contains("\"type\": \"integer\""))

    val back = DataPackage.read(spark, tmp, "res", Seq(
      "id" -> "integer", "name" -> "string", "score" -> "number",
      "active" -> "boolean"))
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.schema("score").dataType.typeName == "double")
    assert(back.as[(Long, String, Double, Boolean)].collect().toSet ==
      Set((1L, "a", 1.5, true), (2L, "b", 2.5, false)))
  }

  test("CsvExtract: nullable-int cast, char strip, column removal") {
    val df = Seq(
      ("Customer#001", "42", "SEG"),
      ("Other#x", "", "SEG2")).toDF("name", "num", "seg")
    val out = CsvExtract.prepare(df,
      columnsToRemove = Seq("seg"),
      intColumns = Seq("num"),
      charactersToRemove = "#")
    assert(out.columns.toSeq == Seq("name", "num"))
    val rows = out.as[(String, Option[Long])].collect().toSet
    assert(rows == Set(("Customer001", Some(42L)), ("Otherx", None)))
  }

  test("rolling hash matches a reference loop, interpreted and codegen'd") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) =>
        (h * RollingHashExpr.Base + (b & 0xFF)) % RollingHashExpr.Mod)

    val inputs = Seq("", "a", "hello world", "ação çédilha", "x" * 10000)
    val viaExpr = inputs.toDF("s")
      .select(RollingHashExpr.rolling_hash(col("s")).as("h"))
      .as[Long].collect().toSeq
    assert(viaExpr == inputs.map(ref))

    // null propagates
    val nulls = Seq(Option.empty[String]).toDF("s")
      .select(RollingHashExpr.rolling_hash(col("s")).as("h"))
      .collect()
    assert(nulls.head.isNullAt(0))

    // non-string input is rejected at analysis
    val err = intercept[Exception] {
      Seq(1).toDF("i").select(RollingHashExpr.rolling_hash(col("i"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("rolling_hash") ||
      err.getMessage.contains("STRING"))
  }
}
