package graft.clean

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CleanersSpec extends SparkSpec {
  import spark.implicits._

  private val at = Timestamp.valueOf("2026-01-01 00:00:00")
  private val meta = TableMeta("src", "sch", "tbl", Seq("id"))

  test("UfCleaner uppercases valid states, nulls invalid ones, and QA-logs both") {
    val df = Seq((1L, "sp"), (2L, "XX"), (3L, "RJ"), (4L, " mg ")).toDF("id", "uf")
    val r = UfCleaner(meta, "uf", at).clean(df)
    val cleaned = r.cleaned.as[(Long, Option[String])].collect().toMap
    assert(cleaned == Map(1L -> Some("SP"), 2L -> None, 3L -> Some("RJ"), 4L -> Some("MG")))
    val qa = r.qa.select("primary_keys_values", "nivel_erro").as[(String, Int)]
      .collect().toMap
    // 3 changed cells: sp->SP (fix), XX->null (null), " mg "->MG (fix);
    // RJ unchanged -> no QA row.
    assert(qa == Map("1" -> QaLevel.CastFix, "2" -> QaLevel.CastNull,
      "4" -> QaLevel.CastFix))
  }

  test("CpfCleaner rejects separator-only and empty inputs (review regression)") {
    val df = Seq((1L, "."), (2L, ".."), (3L, "-"), (4L, ""), (5L, null))
      .asInstanceOf[Seq[(Long, String)]].toDF("id", "cpf")
    val r = CpfCleaner(meta, "cpf", at).clean(df)
    val cleaned = r.cleaned.select("id", "cpf")
      .as[(Long, Option[String])].collect().toMap
    // none may become "00000000000" — all null
    assert(cleaned.values.forall(_.isEmpty), s"got $cleaned")
    // separator-only inputs ARE QA-logged (zeroed arm); empty/null are not
    assert(r.qa.count() == 3)
  }

  test("TextCropperCleaner crops to size-3 plus ellipsis") {
    val df = Seq((1L, "x" * 20), (2L, "short")).toDF("id", "t")
    val r = TextCropperCleaner(meta, "t", 10, at).clean(df)
    val out = r.cleaned.as[(Long, String)].collect().toMap
    assert(out(1L) == "x" * 7 + "...")
    assert(out(1L).length == 10)
    assert(out(2L) == "short")
    assert(r.qa.count() == 1)
  }

  test("DuplicatedRowCleaner keeps first by explicit order and logs DROP_LINEs") {
    val df = Seq((1L, "a", 1), (1L, "b", 2), (2L, "c", 1)).toDF("id", "v", "ord")
    val r = DuplicatedRowCleaner(meta, Seq("ord"), at).clean(df)
    assert(r.cleaned.select("v").as[String].collect().toSet == Set("a", "c"))
    val qa = r.qa.collect()
    assert(qa.length == 1)
    assert(qa.head.getAs[Int]("nivel_erro") == QaLevel.DropLine)
    assert(qa.head.getAs[String]("primary_keys_values") == "1")
  }

  test("MappingCleaner canonicalizes via broadcast join, passthrough otherwise") {
    val df = Seq((1L, "sao paulo"), (2L, "rio"), (3L, "unknown")).toDF("id", "city")
    val mapping = Seq(("sao paulo", "São Paulo"), ("rio", "Rio de Janeiro"))
      .toDF("city", "valor_canonico")
    val r = MappingCleaner(meta, "city", mapping, at).clean(df)
    val out = r.cleaned.as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "São Paulo", 2L -> "Rio de Janeiro", 3L -> "unknown"))
    assert(r.qa.count() == 2)
  }

  test("MultiKeyMappingCleaner drops unmapped rows with DROP_LINE QA") {
    val df = Seq((1L, "org-a", "unit-1"), (2L, "org-b", "unit-9"))
      .toDF("id", "org", "unit")
    val mapping = Seq(("org-a", "unit-1", "CAT-A", 100L))
      .toDF("org", "unit", "categoria", "cod_siorg")
    val r = MultiKeyMappingCleaner(meta, Seq("org", "unit"), mapping, at).clean(df)
    assert(r.cleaned.count() == 1)
    assert(r.cleaned.columns.contains("categoria")) // ADD_COLUMN semantics
    // 1 DROP_LINE (unmapped row) + 2 ADD_COLUMN (categoria, cod_siorg)
    val byLevel = r.qa.groupBy("nivel_erro").count()
      .as[(Int, Long)].collect().toMap
    assert(byLevel == Map(QaLevel.DropLine -> 1L, QaLevel.AddColumn -> 2L))
  }

  test("PatchMerge overwrites cells including explicit nulls (pandas .loc semantics)") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal")
    val patch = Seq((1L, Option.empty[Double]), (2L, Some(99.0)))
      .toDF("id", "bal")
    val out = PatchMerge.applyPatch(base, patch, Seq("id"))
      .select("id", "bal").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> None, 2L -> Some(99.0), 3L -> Some(30.0)))
  }

  test("PatchMerge drop-lines removes rows by PK tuple, deduplicated") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val drops = Seq(2L, 2L).toDF("id")
    val out = PatchMerge.applyDropLines(base, drops, Seq("id"))
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("cleaner chain unions QA across stages") {
    val df = Seq((1L, "sp", "y" * 20), (2L, "zz", "ok")).toDF("id", "uf", "t")
    val r = Cleaner.chain(df, Seq(
      UfCleaner(meta, "uf", at),
      TextCropperCleaner(meta, "t", 10, at)))
    assert(r.cleaned.count() == 2)
    assert(r.qa.count() == 3) // sp fix, zz null, crop fix
  }
}
