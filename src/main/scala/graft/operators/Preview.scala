package graft.operators

import org.apache.spark.sql.DataFrame

/** Frame preview — the reference's pre-load diagnostic (reference:
  * dags/etl/load_to_redshift.py:218-220 logs `df.dtypes` and
  * `df.head()`) as a safe-at-scale operation: the row fetch uses
  * `take(n)`, which plans as CollectLimit and stops the scan after the
  * first partitions yield n rows — previewing a 100 TB table costs a
  * few row-groups, never a full materialization. Output is a plain
  * string so callers can route it to any log sink
  * ([[graft.sources.RunLog]] being the reference-shaped one).
  */
object Preview {

  /** Schema (name: type per line, nullability marked) followed by the
    * first `n` rows as an aligned table. Cells longer than `maxWidth`
    * are truncated with an ellipsis; nulls render as `null`. Row order
    * is the frame's natural order (same contract as pandas `head`). */
  def preview(df: DataFrame, n: Int = 5, maxWidth: Int = 40): String = {
    require(n > 0, s"need positive n: $n")
    require(maxWidth >= 4, s"need maxWidth >= 4: $maxWidth")
    val dtypes = df.schema.fields.map { f =>
      val null0 = if (f.nullable) "" else " not null"
      s"${f.name}: ${f.dataType.simpleString}$null0"
    }.mkString("\n")
    def cell(v: Any): String = {
      val s = if (v == null) "null" else v.toString
      if (s.length <= maxWidth) s else s.take(maxWidth - 1) + "…"
    }
    val header = df.columns.toSeq
    val rows = df.take(n).map(r =>
      (0 until r.length).map(i => cell(r.get(i))))
    val widths = header.indices.map { i =>
      (header(i).length +: rows.map(_(i).length)).max
    }
    def line(cells: Seq[String]) = cells.zip(widths)
      .map { case (c, w) => c.padTo(w, ' ') }.mkString("| ", " | ", " |")
    val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    (Seq(dtypes, sep, line(header), sep) ++
      rows.map(line) :+ sep).mkString("\n")
  }
}
