package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema + statistics drift audit between two snapshots of "the same"
  * table — the data-contract check a pipeline runs before pointing
  * production at a new crawl/export: which columns appeared,
  * disappeared, or changed type, and how the null rate and distinct
  * cardinality of surviving columns moved. ([[SnapshotDiff]] answers
  * which ROWS changed; this answers whether the SHAPE of the data
  * still honors the contract.)
  *
  * Scale shape: one aggregate pass per snapshot computing every
  * column's (count, nulls, exact NDV) — the multi-`countDistinct`
  * expand is bounded by the COLUMN count, not rows — then the
  * per-column stats rows meet in a full outer join on column name
  * (schema-sized, broadcast). No row-level join between the
  * snapshots, so the audit costs two scans regardless of |old|+|new|.
  */
object SchemaDrift {

  private def stats(df: DataFrame, side: String): DataFrame = {
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      Seq(count(when(col(f.name).isNull, 1)).as(s"__n_${f.name}"),
        countDistinct(col(f.name)).as(s"__d_${f.name}"))
    } :+ count(lit(1)).as("__rows")
    val entries = cols.map { f =>
      struct(lit(f.name).as("column"), lit(f.dataType.catalogString).as(s"${side}_type"),
        col("__rows").as(s"${side}_rows"), col(s"__n_${f.name}").as(s"${side}_nulls"),
        col(s"__d_${f.name}").as(s"${side}_ndv"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entries: _*)).as("e"))
      .select(col("e.*"))
  }

  /** @return one row per column name seen in either snapshot:
    *         (column, status, type_changed, old_type, new_type,
    *          old_rows, old_nulls, old_ndv, new_rows, new_nulls, new_ndv)
    */
  def audit(oldDf: DataFrame, newDf: DataFrame): DataFrame =
    stats(oldDf, "old").join(stats(newDf, "new"), Seq("column"), "full_outer")
      .withColumn("status",
        when(col("old_type").isNull, "added")
          .when(col("new_type").isNull, "removed")
          .otherwise("common"))
      .withColumn("type_changed",
        col("status") === "common" && col("old_type") =!= col("new_type"))
      .select(col("column"), col("status"), col("type_changed"),
        col("old_type"), col("new_type"), col("old_rows"), col("old_nulls"),
        col("old_ndv"), col("new_rows"), col("new_nulls"), col("new_ndv"))
}
