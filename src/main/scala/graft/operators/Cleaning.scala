package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cleaning kernel — the reference's type-cast / sanitize pass
  * (reference: Form700.py:246-298), re-expressed as codegen-friendly
  * Catalyst expressions (no UDFs in the hot path except F5, which is a
  * native Expression — see [[graft.functions.AsciiBackslash]]).
  *
  * All functions are pure `Column → Column` / `DataFrame → DataFrame`
  * so they compose inside a single whole-stage-codegen span.
  */
object Cleaning {

  /** F1 (Form700.py:296-298): strip embedded newlines from every string
    * column of a table. */
  def removeNewLines(df: DataFrame): DataFrame = {
    // Backticked refs: flattened columns may carry literal dots in their
    // names (`loan.address`, form700_scheduleB_schema.csv:20-30).
    val cols = df.schema.fields.map { f =>
      if (f.dataType == StringType)
        regexp_replace(col(s"`${f.name}`"), "\n", "").as(f.name)
      else col(s"`${f.name}`")
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** F2 (Form700.py:267): the reference's number sanitizer replaces each
    * char matching [a-zA-Z%] with a literal '0' before casting
    * (so "12%" becomes "120" — quirk preserved deliberately). */
  def sanitizeNumber(c: Column): Column =
    regexp_replace(c.cast(StringType), "[a-zA-Z%]", "0")

  /** F4+F3 (Form700.py:261-273): cast to long with 0 default; the
    * reference falls back to float for columns where any value fails the
    * int parse — here the declared schema decides the type and the
    * per-value fallback is explicit. */
  def toLongOrZero(c: Column): Column =
    coalesce(sanitizeNumber(c).try_cast(LongType), lit(0L))

  /** Float variant of the F4 fallback path (Form700.py:271-273). */
  def toDoubleOrZero(c: Column): Column =
    coalesce(sanitizeNumber(c).try_cast(DoubleType), lit(0.0))

  /** F3 (Form700.py:275,283): null defaults for text / checkbox. */
  def textOrEmpty(c: Column): Column = coalesce(c.cast(StringType), lit(""))
  def checkboxOrFalse(c: Column): Column =
    coalesce(c.cast(BooleanType), lit(false))

  /** P2 (Form700.py:249-253): project + reorder to a declared column
    * list; fails fast on missing columns exactly like the reference. */
  def projectToSchema(df: DataFrame, fieldNames: Seq[String]): DataFrame =
    df.select(fieldNames.map(n => col(s"`$n`")): _*)
}
