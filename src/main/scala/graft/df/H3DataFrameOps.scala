package graft.df

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/**
 * DataFrame-level H3 operators — the Spark counterpart of the reference's
 * `H3DataFrame` extension traits (SURVEY.md §2.5; h3ron-polars/src/algorithm/
 * frame/compact.rs, resolution.rs, valid.rs).
 *
 * Declarative plans only: compaction is a `groupBy(all other columns)` +
 * [[graft.functions.h3_compact_agg]] (one shuffle, partial agg dedups
 * map-side); uncompaction builds a distinct-cell fan-out mapping and joins
 * it back (dedup-before-fan-out mirrors frame/compact.rs:247). Catalyst/AQE
 * choose join strategies; at 100 TB the mapping side is derived from
 * `distinct(cell)` so it is the small side whenever compaction did its job.
 */
object H3DataFrameOps {

  implicit class RichH3DataFrame(val df: DataFrame) extends AnyVal {

    /** F4/C1: append a resolution column. */
    def h3Resolution(cellCol: String, asCol: String = "h3_resolution"): DataFrame =
      df.withColumn(asCol, h3_get_resolution(col(cellCol)))

    /** F6: drop rows whose index is NULL or invalid. */
    def h3FilterValid(cellCol: String): DataFrame =
      df.filter(h3_is_valid_cell(col(cellCol)))

    /** F7: action — true iff every row holds a valid cell. */
    def h3AllValid(cellCol: String): Boolean =
      df.filter(!h3_is_valid_cell(col(cellCol)) || col(cellCol).isNull).isEmpty

    /** F1: group by all non-cell columns, compact each group's cell set.
      * `exploded=false` keeps the compacted cells as an array column. */
    def h3CompactDataFrame(cellCol: String, exploded: Boolean = true): DataFrame = {
      val others = df.columns.filter(_ != cellCol)
      val agged =
        if (others.isEmpty) df.agg(h3_compact_agg(col(cellCol)).as(cellCol))
        else df.groupBy(others.map(col).toIndexedSeq: _*)
          .agg(h3_compact_agg(col(cellCol)).as(cellCol))
      val reordered = agged.select(df.columns.map(col).toIndexedSeq: _*)
      if (exploded) reordered.withColumn(cellCol, explode(col(cellCol)))
      else reordered
    }

    /** F2: expand every cell to `targetRes`. Distinct-cell mapping join —
      * same plan shape as the reference (frame/compact.rs:108-295); rows
      * whose cell is finer than `targetRes` are dropped (its :268-271 rule). */
    def h3UncompactDataFrame(cellCol: String, targetRes: Int): DataFrame = {
      val tmp = cellCol + "__uncompacted"
      val mapping = df.select(col(cellCol)).distinct()
        .select(col(cellCol), explode(h3_uncompact_cell(col(cellCol), lit(targetRes))).as(tmp))
      df.join(mapping, cellCol)
        .drop(cellCol)
        .withColumnRenamed(tmp, cellCol)
        .select(df.columns.map(col).toIndexedSeq: _*)
    }

    /** F3: like [[h3UncompactDataFrame]] but only keeping target-res cells
      * that are descendants of `subset` (pre-normalized to `targetRes`,
      * mirroring frame/compact.rs:151-153). Uses a broadcast semi-join —
      * the Spark analogue of the reference's `H3Treemap` membership set. */
    def h3UncompactDataFrameSubset(cellCol: String, targetRes: Int, subset: Seq[Long]): DataFrame = {
      import graft.h3.H3Core
      val norm: Array[Long] = subset.toArray.flatMap(H3Core.uncompactCell(_, targetRes))
      val tmp = cellCol + "__uncompacted"
      val mapping = df.select(col(cellCol)).distinct()
        .select(col(cellCol), explode(h3_uncompact_cell(col(cellCol), lit(targetRes))).as(tmp))
        .filter(col(tmp).isInCollection(norm))
      df.join(mapping, cellCol)
        .drop(cellCol)
        .withColumnRenamed(tmp, cellCol)
        .select(df.columns.map(col).toIndexedSeq: _*)
    }

    /** G9: aligned dissolve — group cells by their parent at `alignRes`,
      * dissolve each group to a (multi)polygon WKT (reference
      * `ToAlignedLinkedPolygons`, to_geo.rs:100-180). One row per parent:
      * (parent, wkt). The per-parent groupBy IS the parallelism the
      * reference runs serially — each group dissolves independently in its
      * task. */
    def h3AlignedDissolve(cellCol: String, alignRes: Int,
        smoothen: Boolean = false): DataFrame =
      df.groupBy(h3_cell_to_parent(col(cellCol), lit(alignRes)).as("parent"))
        .agg(collect_set(col(cellCol)).as("__cells"))
        .select(col("parent"),
          h3_cells_to_multipolygon_wkt(col("__cells"), lit(smoothen)).as("wkt"))

    /** F5: split by resolution. Scale note: for writing, prefer
      * `df.withColumn("res", ...).write.partitionBy("res")` — this variant
      * materializes one DataFrame per distinct resolution like the
      * reference (frame/resolution.rs:35-67). */
    def h3PartitionByResolution(cellCol: String): Seq[(Int, DataFrame)] = {
      val resCol = h3_get_resolution(col(cellCol))
      val distinctRes = df.select(resCol.as("r")).distinct().collect()
        .map(_.getInt(0)).sorted
      distinctRes.toIndexedSeq.map(r => r -> df.filter(resCol === lit(r)))
    }

    /** Named neighbor-window operator — the relational form of the
      * reference's `neighbors_within_distance_window_or_default`
      * iterator (h3ron/src/iter/neighbor.rs:94-115): for every cell of
      * this frame that HAS a value (null-valued rows are not visited as
      * centers, the iterator's `get_cell_value_fn → None` rule), emit one
      * row per disk neighbor in `kMin..kMax` whose value is known —
      * `(cell, cell_value, neighbor_cell, neighbor_value, k)`. A
      * neighbor absent from the frame takes `defaultValue` when given
      * (the `_or_default` variant); with no default it is skipped, and
      * `kMin = 0` includes the center itself, exactly as the reference's
      * `GridDiskBuilder(k_min, k_max)` window does.
      *
      * Plan shape: explode the k-window disk (a per-row expression, no
      * shuffle), then ONE equi-join back on the neighbor cell for the
      * value lookup — hash-partitioned by cell at scale, broadcast when
      * the value frame is small; nothing quadratic, fan-out is the fixed
      * disk size ~3k(k+1)+1 per center. */
    def h3NeighborsWithValues(cellCol: String, valueCol: String,
        kMin: Int, kMax: Int, defaultValue: Option[Column] = None): DataFrame = {
      require(kMin >= 0 && kMax >= kMin,
        s"need 0 <= kMin <= kMax, got kMin=$kMin kMax=$kMax")
      val values = df.select(col(cellCol).as("__nc"), col(valueCol).as("__nv"))
        .filter(col("__nv").isNotNull)
      val centers = df
        .select(col(cellCol).as("cell"), col(valueCol).as("cell_value"))
        .filter(col("cell_value").isNotNull)
        .select(col("cell"), col("cell_value"),
          explode(h3_grid_disk_distances_window(col("cell"), lit(kMin), lit(kMax)))
            .as("__n"))
        .select(col("cell"), col("cell_value"),
          col("__n.cell").as("neighbor_cell"), col("__n.k").as("k"))
      val joined = centers.join(values, centers("neighbor_cell") === values("__nc"), "left")
      val withVal = defaultValue match {
        case Some(d) => joined.withColumn("neighbor_value", coalesce(col("__nv"), d))
        case None => joined.filter(col("__nv").isNotNull)
          .withColumn("neighbor_value", col("__nv"))
      }
      withVal.select(col("cell"), col("cell_value"), col("neighbor_cell"),
        col("neighbor_value"), col("k"))
    }
  }
}
