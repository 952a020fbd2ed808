package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{DataPackage, Naming, TypeMapper}
import graft.functions.RollingHashExpr

/** Property-based checks for the pure (driver-side) functions; Spark-side
  * operator properties (merge idempotence etc.) live in the operator
  * specs where a session exists. */
object GraftProperties extends Properties("graft") {

  property("slugify is idempotent") = forAll { (s: String) =>
    val once = Naming.slugify(s)
    Naming.slugify(once) == once
  }

  property("slugify output alphabet is [a-z0-9_]") = forAll { (s: String) =>
    Naming.slugify(s).forall(c =>
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_')
  }

  property("slugify never produces leading/trailing underscores") =
    forAll { (s: String) =>
      val out = Naming.slugify(s)
      out.isEmpty || (!out.startsWith("_") && !out.endsWith("_"))
    }

  property("rolling hash is deterministic and in [0, mod)") =
    forAll { (s: String) =>
      val h1 = RollingHashExpr.hash(UTF8String.fromString(s))
      val h2 = RollingHashExpr.hash(UTF8String.fromString(s))
      h1 == h2 && h1 >= 0 && h1 < RollingHashExpr.Mod
    }

  private val typeNames = Gen.oneOf(
    "string", "integer", "short", "long", "biginteger", "boolean",
    "float", "double", "decimal", "bigdecimal", "timestamp", "date",
    "object", "xml")

  property("TypeMapper round trip: every source type maps to DDL in every dialect") =
    forAll(typeNames, Gen.oneOf[TypeMapper.Dialect](
      TypeMapper.Postgres, TypeMapper.MsSql, TypeMapper.MySql)) { (t, d) =>
      val spark = TypeMapper.toSpark(t)
      TypeMapper.toDdl(spark, d).nonEmpty
    }

  property("decimal caps always within (38,8)") =
    forAll(Gen.choose(1, 100), Gen.choose(0, 50)) { (p, s) =>
      val dt = TypeMapper.toSpark("decimal", precision = Some(p), scale = Some(s))
        .asInstanceOf[org.apache.spark.sql.types.DecimalType]
      dt.precision <= 38 && dt.scale <= 8
    }

  property("frictionless type round trip preserves the value family") =
    forAll(Gen.oneOf("string", "integer", "number", "boolean", "datetime", "date")) { t =>
      DataPackage.frictionlessType(DataPackage.sparkType(t)) == t
    }

  property("unicode_normalize is idempotent in all four forms") =
    forAll(Gen.oneOf("NFC", "NFD", "NFKC", "NFKD"),
      org.scalacheck.Arbitrary.arbitrary[String]) { (f, s) =>
      val form = graft.functions.NormalizeExpr.formOf(f)
      val once = graft.functions.NormalizeExpr.normalize(
        UTF8String.fromString(s), form)
      graft.functions.NormalizeExpr.normalize(once, form) == once
    }

  property("NFC(NFD(s)) == NFC(s): canonical forms agree through decomposition") =
    forAll { (s: String) =>
      import graft.functions.NormalizeExpr.{formOf, normalize}
      val u = UTF8String.fromString(s)
      normalize(normalize(u, formOf("NFD")), formOf("NFC")) ==
        normalize(u, formOf("NFC"))
    }
}
