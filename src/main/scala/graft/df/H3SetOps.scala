package graft.df

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Set relations between cell DataFrames — the distributed counterpart of
 * the reference's `H3Treemap` roaring-bitmap operations
 * (h3ron/src/collections/treemap/mod.rs:87-99: `contains`, `is_disjoint`,
 * `is_subset`, `is_superset`).
 *
 * Each relation is one semi/anti join + emptiness check; Catalyst
 * broadcasts the smaller side and AQE handles skew, so these behave like
 * bitmap probes at any scale. The reference's in-memory treemap maps to a
 * broadcast join build side here.
 */
object H3SetOps {

  /** every cell of `a` is in `b`. */
  def isSubset(a: DataFrame, aCol: String, b: DataFrame, bCol: String): Boolean =
    a.join(b.select(col(bCol).as("__b")), col(aCol) === col("__b"), "left_anti").isEmpty

  def isSuperset(a: DataFrame, aCol: String, b: DataFrame, bCol: String): Boolean =
    isSubset(b, bCol, a, aCol)

  /** no cell in common. */
  def isDisjoint(a: DataFrame, aCol: String, b: DataFrame, bCol: String): Boolean =
    a.join(b.select(col(bCol).as("__b")), col(aCol) === col("__b"), "left_semi").isEmpty

  /** treemap `contains` over a whole column: cells of `a` present in `b`. */
  def containsMask(a: DataFrame, aCol: String, b: DataFrame, bCol: String): DataFrame =
    a.join(b.select(col(bCol).as("__b")).distinct(),
      col(aCol) === col("__b"), "left_outer")
      .withColumn("contained", col("__b").isNotNull)
      .drop("__b")
}
