package graft.operators

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Path}

/** K7/E2 — the reference's schema bootstrap
  * (`prepareDataSetSchema`, Form700.py:194-232): infer a table's column
  * list, emit (dataTypeName, fieldName, displayName) rows with a
  * titleized display name and an EMPTY type (a human fills types in by
  * hand — Form700.py:229), and write the CSV only if absent. A dev-mode
  * utility, not a runtime path (the live pipeline never regenerates
  * schemas — the call is commented out at Form700.py:660-662).
  */
object SchemaBootstrap {

  /** F6 (Form700.py:201, `inflection.titleize`): `camelCase` /
    * `snake_case` / dotted field name → `Title Case` display name. */
  def titleize(fieldName: String): String =
    fieldName
      .replace(".", " ").replace("_", " ")
      .replaceAll("([a-z\\d])([A-Z])", "$1 $2")
      .split("\\s+").filter(_.nonEmpty)
      .map(w => w.head.toUpper + w.tail)
      .mkString(" ")

  /** `make_columns` (Form700.py:194-209): one (type, field, display)
    * row per column, type left blank for hand-curation. */
  def makeColumns(df: DataFrame): Seq[(String, String, String)] =
    df.schema.fields.toIndexedSeq.map(f => ("", f.name, titleize(f.name)))

  /** `makeSchemaCsv` (Form700.py:211-221): write the bootstrap CSV iff
    * the file does not already exist; returns true when written. */
  def writeSchemaCsvIfAbsent(df: DataFrame, path: Path): Boolean = {
    if (Files.exists(path)) false
    else {
      val header = "dataTypeName,fieldName,name"
      val rows = makeColumns(df).map { case (t, f, d) => s"$t,$f,$d" }
      Files.createDirectories(path.toAbsolutePath.getParent)
      Files.writeString(path, (header +: rows).mkString("\n") + "\n")
      true
    }
  }
}
