package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Restructuring kernel — the array/struct reshaping that is the heart of
  * the reference (serialize array-of-struct, explode array-of-struct,
  * flatten nested struct; reference: Form700.py:306-383).
  *
  * Everything here is higher-order-function / built-in Generator based —
  * no UDFs, no custom Generator — so the whole pass stays inside
  * whole-stage codegen and scales as a narrow transform (no shuffle).
  */
object Restructure {

  /** P1 (Form700.py:153,181,367 — pandas json_normalize): recursively
    * flatten nested structs into dot-named top-level columns
    * (`loan.address` etc., see form700_scheduleB_schema.csv:20-30).
    * Arrays are left intact (they are handled by X1/X2). */
  def flattenStruct(df: DataFrame): DataFrame = {
    // Generated names keep the reference's dotted convention
    // (`loan.address`); navigation goes through getField so literal dots
    // in produced names never need re-parsing.
    def cols(schema: StructType, parent: Option[Column], prefix: String): Seq[Column] =
      schema.fields.toIndexedSeq.flatMap { f =>
        val c = parent.map(_.getField(f.name)).getOrElse(col(s"`${f.name}`"))
        val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case s: StructType => cols(s, Some(c), name)
          case _             => Seq(c.as(name))
        }
      }
    df.select(cols(df.schema, None, ""): _*)
  }

  /** X1 (Form700.py:306-323): serialize an array-of-struct column into a
    * single string — each struct rendered as `k:v,k:v` (field order), an
    * empty-string or null value rendered as the token `None` (the
    * reference's Python `str(None)`), structs joined by `|`.
    *
    * Pure higher-order functions (`transform` + `concat_ws`) — stays in
    * codegen, no UDF. */
  def serializeStructArray(df: DataFrame, colName: String): DataFrame = {
    val arrType = df.schema(colName).dataType.asInstanceOf[ArrayType]
    val fields = arrType.elementType.asInstanceOf[StructType].fields.toIndexedSeq
    val serialized = concat_ws("|",
      transform(col(colName), s =>
        concat_ws(",", fields.map { f =>
          val v = s.getField(f.name).cast(StringType)
          concat(lit(f.name + ":"),
            when(v.isNull || v === "", lit("None")).otherwise(v))
        }: _*)))
    df.withColumn(colName, serialized)
  }

  /** X2 (Form700.py:354-383): LATERAL-VIEW-OUTER-explode one
    * array-of-struct column: parent row × N child structs → N rows with
    * the child fields as new flat columns; an empty/null array keeps the
    * parent row with null children; the array column itself is dropped.
    *
    * One `explode_outer` replaces the reference's O(rows) Python loop +
    * per-row filter + left merge (Form700.py:376-380) — a narrow
    * transform with no shuffle and no surrogate join key.
    *
    * X3 (Form700.py:356-362): child fields are prefixed
    * (`x` → `<prefix>X`, first letter uppercased) when `prefix` is set —
    * matches form700_scheduleA2_schema.csv:30-40. */
  def explodeStructArray(df: DataFrame, colName: String,
                         prefix: Option[String] = None): DataFrame = {
    val arrType = df.schema(colName).dataType.asInstanceOf[ArrayType]
    val fields = arrType.elementType.asInstanceOf[StructType].fields.toIndexedSeq
    val parentCols = df.columns.toIndexedSeq.filter(_ != colName)
      .map(n => col(s"`$n`"))
    val childName: String => String = prefix match {
      case Some(p) => n => p + n.take(1).toUpperCase + n.drop(1)
      case None    => identity
    }
    df.withColumn("__x2_child", explode_outer(col(colName)))
      .select(parentCols ++ fields.map(f =>
        col("__x2_child").getField(f.name).as(childName(f.name))): _*)
  }

  /** Snake-case + dot-strip rename used at the sink boundary
    * (F7, Form700.py:419-421,465-466): `loan.address` → `loanaddress`,
    * `filerName` → `filer_name`. */
  def toSinkName(fieldName: String): String = {
    val noDots = fieldName.replace(".", "")
    noDots.replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
      .replaceAll("([a-z\\d])([A-Z])", "$1_$2").toLowerCase
  }

  /** K2 rename pass: apply [[toSinkName]] to every column. */
  def renameForSink(df: DataFrame): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(toSinkName): _*)
}
