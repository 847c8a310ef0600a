package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.df.H3DataFrameOps._

/**
 * Driver contract: named queries + DuckDB oracle SQL.
 *
 * The testdata carries no coordinates, so H3 cells are *synthesized*
 * deterministically from integer keys with pure arithmetic that is valid in
 * both Spark SQL and DuckDB ([[Synth]]). Every bit-layer operator therefore
 * gets an exact relational oracle; geometry operators (added in later
 * rounds) get rows-only checks.
 */
object SparkEntry {

  /** Statement prefix for oracles that died of DuckDB OOM in the r13 driver
    * run (p86/p87/p88): the sandbox runs the oracle while a Spark JVM may
    * still hold most of RAM, and an unconfigured in-memory DuckDB neither
    * caps its footprint nor spills (no temp_directory => no out-of-core).
    * The duckdb Python API executes multi-statement strings and returns the
    * last result, so a `SET ...;` prefix travels inside the oracle SQL
    * itself — the one channel the driver actually reads. Verified against
    * duckdb 1.0.0 through both `execute().df()` and `sql().df()`. */
  val OracleMemGuard: String =
    "SET memory_limit='2GB'; SET threads=2; " +
      "SET temp_directory='/tmp/graft_duckdb_spill'; "

  /** Portable (Spark SQL ∩ DuckDB) cell synthesis from a non-negative
    * integer key expression. Produces valid H3 cells at `res` with base
    * cells 25..37 (a pentagon-free run) and digits derived from the key.
    * Only +, *, %, floor and literals — identical semantics in both engines.
    */
  object Synth {
    private def pow7(n: Int): Long = { var p = 1L; (1 to n).foreach(_ => p *= 7); p }

    def cellSql(k: String, res: Int): String = {
      require(res >= 1 && res <= 15)
      val mode = 1L << 59
      val resField = res.toLong << 52
      val digits = (1 to res).map { r =>
        val w = 1L << (3 * (15 - r))
        s"(CAST(FLOOR(($k) / ${pow7(r - 1)}) AS BIGINT) % 7) * $w"
      }
      val lowOnes = (1L << (3 * (15 - res))) - 1
      // suffix-free literals: both Spark SQL and DuckDB promote out-of-int-range
      // literals to BIGINT, and INT (+|*) BIGINT promotes to BIGINT.
      (Seq(s"$mode", s"$resField", s"(25 + (($k) % 13)) * ${1L << 45}") ++ digits ++ Seq(s"$lowOnes"))
        .mkString("(", " + ", ")")
    }

    /** Same fragment runs verbatim in DuckDB. */
    def oracleCellSql(k: String, res: Int): String = cellSql(k, res)

    /** Scala mirror of [[cellSql]] for driver-side construction. */
    def cell(k: Long, res: Int): Long = {
      require(res >= 1 && res <= 15)
      var h = (1L << 59) | (res.toLong << 52) | ((25 + (k % 13)) << 45)
      (1 to res).foreach { r =>
        h += ((k / pow7(r - 1)) % 7) * (1L << (3 * (15 - r)))
      }
      h + ((1L << (3 * (15 - res))) - 1)
    }
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: synthesized events cells -> parent rollup -> compact the hot
    * parents; exercises expressions + aggregate end-to-end. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val ev = t(spark, dir, "events")
      .withColumn("cell", expr(Synth.cellSql("event_id", 9)))
    ev.withColumn("parent", h3_cell_to_parent(col("cell"), lit(5)))
      .groupBy("parent")
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .filter(col("n") > 0)
  }

  // ---------------------------------------------------------------------
  // Query catalog. Key invariants for the driver compare:
  //  * column names identical to the oracle (aliased on both sides)
  //  * deterministic ORDER BY on a unique prefix
  //  * integer outputs cast to BIGINT on both sides
  //  * double outputs rounded on both sides
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ PipelineQueries.queries ++ GeoQueries.queries ++ GraphQueries.queries ++ RasterQueries.queries ++ StreamingQueries.queries

  // Revenue sums aggregate in DECIMAL, not double: the true per-row
  // product price*(1-discount) is an exact 4-dp decimal (2 dp x 2 dp),
  // and the double product computed from the nearest-double sources is
  // within ~1e-10 of it — far inside the 5e-5 recovery threshold — so ONE
  // decimal(18,4) cast of the product recovers the intended value EXACTLY
  // and the decimal sum is order-independent. (Casting both operands and
  // multiplying in decimal is equally exact but pays a per-row BigDecimal
  // multiply — measured 1.8x on q03's 1.5M-group aggregate.) A double sum
  // is not order-independent — at sf1.0 a ~4.5e10 group sum lands within
  // one addition-order perturbation (~1e-2) of the 2-dp rounding boundary
  // and the last cent flips between Spark and DuckDB (and between Spark
  // runs with different partition orders); at 100 TB the double result is
  // irreproducible by construction. sum_qty stays double: quantities are
  // small integers, exact in binary at any SF.
  private def discPrice: Column =
    (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")

  private val DiscPriceSql = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_lineitem_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 5)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(discPrice), 2).cast("double").as("sum_disc_price"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q02_revenue_by_nation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(discPrice), 2).cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("n_name"))
    }),

    "q03_top_orders" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_orderkey"))
        .agg(round(sum(discPrice), 2).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    "h3_01_resolution" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("cell", expr(Synth.cellSql("event_id", 9)))
        .select(h3_get_resolution(col("cell")).cast("long").as("res"),
          col("cell"))
        .groupBy(col("res"))
        .agg(count(lit(1)).as("n"), sum(col("cell") % 1000000).as("cell_sum"))
        .orderBy(col("res"))
    }),

    "h3_02_parent_rollup" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("cell", expr(Synth.cellSql("event_id", 9)))
        .withColumn("parent", h3_cell_to_parent(col("cell"), lit(5)))
        .groupBy(col("parent"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("parent"))
    }),

    "h3_03_validity" -> ((s, dir) => {
      // two corruption classes: mode flipped to 2, and a 7-digit inside res
      t(s, dir, "events")
        .withColumn("cell",
          expr(Synth.cellSql("event_id", 9)) +
            when(col("event_id") % 10 === 0, lit(1L << 59)).otherwise(lit(0L)) +
            when(col("event_id") % 10 === 5, lit(7L << 42) - (expr(s"(CAST(FLOOR(event_id / 1) AS BIGINT) % 7) * ${1L << 42}L")))
              .otherwise(lit(0L)))
        .select(h3_is_valid_cell(col("cell")).as("valid"))
        .groupBy(col("valid"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("valid"))
    }),

    "h3_04_children" -> ((s, dir) => {
      // distinct synthesized res-3 cells -> children at res 4 (explode)
      t(s, dir, "events")
        .select(expr(Synth.cellSql("user_id", 3)).as("parent")).distinct()
        .select(col("parent"), explode(h3_cell_to_children(col("parent"), lit(4))).as("child"))
        .orderBy(col("parent"), col("child"))
    }),

    "h3_05_compact" -> ((s, dir) => {
      // full uncompact of distinct res-5 cells to res 7, then compact back:
      // oracle = the original distinct res-5 cells
      t(s, dir, "events")
        .select(expr(Synth.cellSql("user_id", 5)).as("cell")).distinct()
        .h3UncompactDataFrame("cell", 7)
        .h3CompactDataFrame("cell")
        .orderBy(col("cell"))
    }),

    "h3_06_uncompact" -> ((s, dir) => {
      t(s, dir, "events")
        .select(expr(Synth.cellSql("user_id", 2)).as("parent")).distinct()
        .withColumn("cell", explode(h3_uncompact_cell(col("parent"), lit(3))))
        .select(col("parent"), col("cell"))
        .orderBy(col("parent"), col("cell"))
    }),

    "h3_07_strings" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("cell", expr(Synth.cellSql("event_id", 9)))
        .select(col("event_id"), h3_cell_to_string(col("cell")).as("hex"),
          h3_string_to_cell(h3_cell_to_string(col("cell"))).as("roundtrip"))
        .orderBy(col("event_id"))
    }),

    "h3_08_edges" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("event_id") < 200)
        .withColumn("cell", expr(Synth.cellSql("event_id", 9)))
        .select(col("event_id"), col("cell"),
          explode(h3_origin_to_directed_edges(col("cell"))).as("edge"))
        .select(col("event_id"), col("edge"),
          h3_edge_origin(col("edge")).as("origin"),
          h3_is_valid_edge(col("edge")).as("edge_valid"),
          h3_is_valid_cell(col("edge")).as("as_cell_valid"))
        .orderBy(col("event_id"), col("edge"))
    }),

    "h3_09_direction" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("cell", expr(Synth.cellSql("event_id", 9)))
        .select(col("event_id"),
          h3_direction(col("cell")).cast("long").as("dir"),
          h3_direction_to_parent(col("cell"), lit(3)).cast("long").as("dir_r3"))
        .orderBy(col("event_id"))
    }),

    "h3_10_base_cells" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("cell", expr(Synth.cellSql("event_id", 9)))
        .select(h3_get_base_cell(col("cell")).cast("long").as("bc"),
          h3_is_pentagon(col("cell")).as("pent"))
        .groupBy(col("bc"), col("pent"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bc"))
    }),

    "h3_11_center_child" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("cell", expr(Synth.cellSql("user_id", 5)))
        .select(col("event_id"),
          h3_cell_to_center_child(col("cell"), lit(8)).as("cc"),
          h3_cell_to_children_size(col("cell"), lit(8)).as("nchildren"))
        .orderBy(col("event_id"))
    })
  )

  // ---------------------------------------------------------------------

  private def oracleSynthEvents(res: Int, k: String = "event_id"): String =
    s"SELECT *, ${Synth.oracleCellSql(k, res)} AS cell FROM events"

  /** Every oracle runs under [[OracleMemGuard]]. The r13→r14 history showed
    * the driver-sandbox OOM *migrates*: guarding only the current victims
    * (p86/p87/p88 in r14) moved the failure to the heaviest unguarded
    * token-unnest oracles (p58/p59). A bounded-memory + spill-enabled DuckDB
    * is strictly safer for every query, so the guard is applied at the map
    * boundary — no per-query whack-a-mole. Queries that already embed the
    * prefix are stripped first so `SET` statements aren't doubled. */
  def oracleSql: Map[String, String] =
    (coreOracleSql ++ PipelineQueries.oracleSql ++ GeoQueries.oracleSql ++ GraphQueries.oracleSql ++ RasterQueries.oracleSql ++ StreamingQueries.oracleSql)
      .map { case (name, sql) => name -> (OracleMemGuard + sql.stripPrefix(OracleMemGuard)) }

  private def coreOracleSql: Map[String, String] = Map(
    "q01_lineitem_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(round(sum($DiscPriceSql), 2) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS n_rows
        |FROM lineitem WHERE l_quantity > 5
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q02_revenue_by_nation" ->
      s"""SELECT n_name,
        |  CAST(round(sum($DiscPriceSql), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q03_top_orders" ->
      s"""SELECT l_orderkey,
        |  CAST(round(sum($DiscPriceSql), 2) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY 1
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "h3_01_resolution" ->
      s"""WITH cells AS (${oracleSynthEvents(9)})
         |SELECT CAST(9 AS BIGINT) AS res, count(*) AS n,
         |  CAST(sum(cell % 1000000) AS BIGINT) AS cell_sum
         |FROM cells GROUP BY 1 ORDER BY res""".stripMargin,

    "h3_02_parent_rollup" ->
      s"""WITH cells AS (${oracleSynthEvents(9)})
         |SELECT ((cell & ~(15::BIGINT << 52)) | (5::BIGINT << 52)) | ((1::BIGINT << 30) - 1) AS parent,
         |  count(*) AS n, round(sum(value), 2) AS total_value
         |FROM cells GROUP BY 1 ORDER BY parent""".stripMargin,

    "h3_03_validity" ->
      s"""WITH cells AS (
         |  SELECT event_id, ${Synth.oracleCellSql("event_id", 9)}
         |    + (CASE WHEN event_id % 10 = 0 THEN 1::BIGINT << 59 ELSE 0 END)
         |    + (CASE WHEN event_id % 10 = 5 THEN (7::BIGINT << 42) - ((CAST(FLOOR(event_id / 1) AS BIGINT) % 7) * (1::BIGINT << 42)) ELSE 0 END)
         |    AS cell
         |  FROM events)
         |SELECT (event_id % 10 NOT IN (0, 5)) AS valid, count(*) AS n
         |FROM cells GROUP BY 1 ORDER BY valid""".stripMargin,

    "h3_04_children" ->
      s"""WITH parents AS (
         |  SELECT DISTINCT ${Synth.oracleCellSql("user_id", 3)} AS parent FROM events)
         |SELECT parent,
         |  parent + (1::BIGINT << 52) + ((d - 7)::BIGINT * (1::BIGINT << 33)) AS child
         |FROM parents, range(7) t(d)
         |ORDER BY parent, child""".stripMargin,

    "h3_05_compact" ->
      s"""SELECT DISTINCT ${Synth.oracleCellSql("user_id", 5)} AS cell
         |FROM events ORDER BY cell""".stripMargin,

    "h3_06_uncompact" ->
      s"""WITH parents AS (
         |  SELECT DISTINCT ${Synth.oracleCellSql("user_id", 2)} AS parent FROM events)
         |SELECT parent,
         |  parent + (1::BIGINT << 52) + ((d - 7)::BIGINT * (1::BIGINT << 36)) AS cell
         |FROM parents, range(7) t(d)
         |ORDER BY parent, cell""".stripMargin,

    "h3_07_strings" ->
      s"""WITH cells AS (${oracleSynthEvents(9)})
         |SELECT event_id, lower(to_hex(cell)) AS hex, cell AS roundtrip
         |FROM cells ORDER BY event_id""".stripMargin,

    "h3_08_edges" ->
      s"""WITH cells AS (${oracleSynthEvents(9)})
         |SELECT event_id,
         |  cell + (1::BIGINT << 59) + (d::BIGINT << 56) AS edge,
         |  cell AS origin, TRUE AS edge_valid, FALSE AS as_cell_valid
         |FROM cells, range(1, 7) t(d)
         |WHERE event_id < 200
         |ORDER BY event_id, edge""".stripMargin,

    "h3_09_direction" ->
      s"""WITH cells AS (${oracleSynthEvents(9)})
         |SELECT event_id,
         |  CAST((cell >> 18) & 7 AS BIGINT) AS dir,
         |  CAST((cell >> 36) & 7 AS BIGINT) AS dir_r3
         |FROM cells ORDER BY event_id""".stripMargin,

    "h3_10_base_cells" ->
      s"""WITH cells AS (${oracleSynthEvents(9)})
         |SELECT CAST((cell >> 45) & 127 AS BIGINT) AS bc, FALSE AS pent, count(*) AS n
         |FROM cells GROUP BY 1, 2 ORDER BY bc""".stripMargin,

    "h3_11_center_child" ->
      s"""WITH cells AS (
         |  SELECT event_id, ${Synth.oracleCellSql("user_id", 5)} AS cell FROM events)
         |SELECT event_id,
         |  ((cell & ~(15::BIGINT << 52)) | (8::BIGINT << 52)) - ((1::BIGINT << 30) - 1) + ((1::BIGINT << 21) - 1) AS cc,
         |  CAST(343 AS BIGINT) AS nchildren
         |FROM cells ORDER BY event_id""".stripMargin
  )
}
