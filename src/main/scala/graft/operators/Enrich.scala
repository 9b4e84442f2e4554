package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-enrichment and derived-column operators (SURVEY.md §2.2-2.3).
  *
  * The reference's compute core is a chain of inner equi-joins of a fact
  * table against small dimensions (reference: dags/etl/kpi_processor.py:59)
  * plus scalar derivations (casts P2-P4, renames P13, defaults P9-P10).
  *
  * Scale posture: every dimension side is broadcast — the fact table is never
  * shuffled for enrichment. Chained broadcast joins fuse into one
  * WholeStageCodegen stage over the fact scan. When a dimension outgrows the
  * broadcast threshold, drop the hint and AQE picks sort-merge; nothing else
  * changes.
  */
object Enrich {

  /** J1/J2: chained fact⋈dim broadcast enrichment on equal-named keys. */
  def enrich(fact: DataFrame, dims: Seq[(DataFrame, Seq[String])]): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, keys)) =>
      acc.join(broadcast(dim), keys, "inner")
    }

  /** P10: fill expected-but-missing columns with defaults
    * (reference: dags/etl/load_to_redshift.py:246-251). */
  def fillMissing(df: DataFrame, defaults: Map[String, Any]): DataFrame =
    defaults.foldLeft(df) { case (acc, (c, d)) =>
      if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(d))
    }

  /** P11: int hour-of-day → timestamp on a PARAMETERIZED anchor day — the
    * reference anchors on wall-clock utcnow() which is nondeterministic
    * (reference: dags/etl/load_to_redshift.py:253-261; SURVEY.md §7.5.1b). */
  def hourToTimestamp(df: DataFrame, hourCol: String, anchorDate: String,
                      out: String): DataFrame =
    df.withColumn(out, expr(
      s"to_timestamp('$anchorDate') + make_interval(0, 0, 0, 0, $hourCol, 0, 0)"))
}
