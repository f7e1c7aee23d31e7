package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cleaning
import graft.functions.AsciiBackslash.asciiBackslash

class CleaningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("F2 sanitize quirk: each [a-zA-Z%] char becomes a literal '0'") {
    val got = Seq("12%", "a1b2", "", "9").toDF("v")
      .select(Cleaning.sanitizeNumber($"v").as("s")).as[String].collect()
    assert(got.toSeq == Seq("120", "0102", "", "9"))
  }

  test("F4+F3: long cast with 0 default; unparseable goes to 0") {
    val got = Seq("15%", "no way", "7", "3.5").toDF("v")
      .select(Cleaning.toLongOrZero($"v").as("n")).as[Long].collect()
    // "3.5" fails the integer parse (reference would flip the column to
    // float; here the declared type wins and the value defaults).
    assert(got.toSeq == Seq(150L, 0L, 7L, 0L))
  }

  test("F1: newlines stripped from every string column only") {
    val df = Seq(("a\nb", 1L, "x\n")).toDF("s1", "n", "s2")
    val row = Cleaning.removeNewLines(df).collect().head
    assert(row.getString(0) == "ab" && row.getLong(1) == 1L
      && row.getString(2) == "x")
  }

  test("F3: checkbox null→false, text null→empty") {
    val df = Seq[(Option[Boolean], Option[String])]((None, None),
      (Some(true), Some("t"))).toDF("b", "s")
    val rows = df.select(
      Cleaning.checkboxOrFalse($"b").as("b"),
      Cleaning.textOrEmpty($"s").as("s")).collect()
    assert(rows(0).getBoolean(0) == false && rows(0).getString(1) == "")
    assert(rows(1).getBoolean(0) == true && rows(1).getString(1) == "t")
  }

  test("F5: ascii passthrough, latin-1 \\xHH, BMP \\uHHHH, astral \\UHHHHHHHH") {
    val got = Seq("plain", "café", "中文", "ok😀")
      .toDF("v").select(asciiBackslash($"v").as("e")).as[String].collect()
    assert(got.toSeq == Seq("plain", "caf\\xe9", "\\u4e2d\\u6587",
      "ok\\U0001f600"))
  }

  test("F5: null propagates") {
    val got = Seq[Option[String]](None).toDF("v")
      .select(asciiBackslash($"v").as("e")).collect()
    assert(got.head.isNullAt(0))
  }

  test("P2: projection prunes and reorders; missing column fails fast") {
    val df = Seq((1, "a", true)).toDF("x", "y", "z")
    assert(Cleaning.projectToSchema(df, Seq("z", "x")).columns.toSeq
      == Seq("z", "x"))
    intercept[Exception] {
      Cleaning.projectToSchema(df, Seq("nope")).collect()
    }
  }

  test("nfcNormalize: composes decomposed sequences, identity on " +
      "already-NFC and ASCII, null-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "cafe\u0301"),   // decomposed: e + combining acute
      (2L, "caf\u00e9"),    // already composed NFC — identity
      (3L, "plain ascii"),
      (4L, null.asInstanceOf[String])).toDF("id", "s")
    val got = df.select(col("id"),
        graft.functions.NfcNormalize.nfcNormalize(col("s")).as("n"))
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L).get == "caf\u00e9" && got(1L).get.length == 4)
    assert(got(2L).get == "caf\u00e9")
    assert(got(3L).get == "plain ascii")
    assert(got(4L).isEmpty, "null propagates")
  }
}
