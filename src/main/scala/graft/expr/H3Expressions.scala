package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.types._


/**
 * Catalyst expression catalog for the H3 bit layer (SURVEY.md §2.1/§2.2,
 * reference operators S4-S9, S17, S19, S21-S23, E2-E4, C1-C2, C6).
 *
 * All expressions are codegen'd (whole-stage) via static calls into
 * [[H3Bridge]]; a `null` bridge result encodes the invalid-input -> SQL NULL
 * convention of the reference (h3ron-polars/src/from.rs:4-33).
 */
trait H3BridgeCodegen { self: Expression =>
  /** fully-qualified static method on [[H3Bridge]] */
  protected def bridgeName: String
  protected final def bridgeCall: String = s"graft.expr.H3Bridge.$bridgeName"

  protected def genNullableBridge(ctx: CodegenContext, ev: ExprCode, args: String): String = {
    val boxed = CodeGenerator.boxedType(dataType)
    val tmp = ctx.freshName("h3res")
    s"""
       |$boxed $tmp = ($boxed) $bridgeCall($args);
       |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
     """.stripMargin
  }
}

abstract class H3UnaryExpr extends UnaryExpression with ExpectsInputTypes with H3BridgeCodegen {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  protected def bridge(h: Long): AnyRef
  override def nullSafeEval(v: Any): Any = bridge(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => genNullableBridge(ctx, ev, c))
}

abstract class H3BinaryIntExpr extends BinaryExpression with ExpectsInputTypes with H3BridgeCodegen {
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  protected def bridge(h: Long, i: Int): AnyRef
  override def nullSafeEval(l: Any, r: Any): Any =
    bridge(l.asInstanceOf[Long], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => genNullableBridge(ctx, ev, s"$l, $r"))
}

abstract class H3PredicateExpr extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  protected def bridgeName: String
  protected def bridge(h: Long): Boolean
  override def nullSafeEval(v: Any): Any = bridge(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.H3Bridge.$bridgeName($c)")
}

// ---- predicates (S5, E2, S15) -------------------------------------------

case class H3IsValidCell(child: Expression) extends H3PredicateExpr {
  override def prettyName: String = "h3_is_valid_cell"
  override protected def bridgeName: String = "isValidCell"
  override protected def bridge(h: Long): Boolean = H3Bridge.isValidCell(h)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class H3IsValidEdge(child: Expression) extends H3PredicateExpr {
  override def prettyName: String = "h3_is_valid_edge"
  override protected def bridgeName: String = "isValidEdge"
  override protected def bridge(h: Long): Boolean = H3Bridge.isValidEdge(h)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class H3IsPentagon(child: Expression) extends H3PredicateExpr {
  override def prettyName: String = "h3_is_pentagon"
  override protected def bridgeName: String = "isPentagon"
  override protected def bridge(h: Long): Boolean = H3Bridge.isPentagon(h)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

// ---- unary scalars (S4, S15, S19, S21, E3) --------------------------------

case class H3Resolution(child: Expression) extends H3UnaryExpr {
  override def prettyName: String = "h3_get_resolution"
  override def dataType: DataType = IntegerType
  override protected def bridgeName: String = "resolution"
  override protected def bridge(h: Long): AnyRef = H3Bridge.resolution(h)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class H3BaseCell(child: Expression) extends H3UnaryExpr {
  override def prettyName: String = "h3_get_base_cell"
  override def dataType: DataType = IntegerType
  override protected def bridgeName: String = "baseCell"
  override protected def bridge(h: Long): AnyRef = H3Bridge.baseCell(h)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class H3CellToString(child: Expression) extends H3UnaryExpr {
  override def prettyName: String = "h3_cell_to_string"
  override def dataType: DataType = StringType
  override protected def bridgeName: String = "cellToString"
  override protected def bridge(h: Long): AnyRef = H3Bridge.cellToString(h)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class H3StringToCell(child: Expression) extends UnaryExpression
    with ExpectsInputTypes with H3BridgeCodegen {
  override def prettyName: String = "h3_string_to_cell"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def bridgeName: String = "stringToCell"
  override def nullSafeEval(v: Any): Any =
    H3Bridge.stringToCell(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => genNullableBridge(ctx, ev, c))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class H3Direction(child: Expression) extends H3UnaryExpr {
  override def prettyName: String = "h3_direction"
  override def dataType: DataType = IntegerType
  override protected def bridgeName: String = "direction"
  override protected def bridge(h: Long): AnyRef = H3Bridge.direction(h)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class H3EdgeOrigin(child: Expression) extends H3UnaryExpr {
  override def prettyName: String = "h3_edge_origin"
  override def dataType: DataType = LongType
  override protected def bridgeName: String = "edgeOrigin"
  override protected def bridge(h: Long): AnyRef = H3Bridge.edgeOrigin(h)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class H3OriginToDirectedEdges(child: Expression) extends H3UnaryExpr {
  override def prettyName: String = "h3_origin_to_directed_edges"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def bridgeName: String = "originToDirectedEdges"
  override protected def bridge(h: Long): AnyRef = H3Bridge.originToDirectedEdges(h)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

// ---- (cell, res) scalars (S6, S8, S7, C2) ---------------------------------

case class H3CellToParent(left: Expression, right: Expression) extends H3BinaryIntExpr {
  override def prettyName: String = "h3_cell_to_parent"
  override def dataType: DataType = LongType
  override protected def bridgeName: String = "cellToParent"
  override protected def bridge(h: Long, i: Int): AnyRef = H3Bridge.cellToParent(h, i)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class H3CellToCenterChild(left: Expression, right: Expression) extends H3BinaryIntExpr {
  override def prettyName: String = "h3_cell_to_center_child"
  override def dataType: DataType = LongType
  override protected def bridgeName: String = "cellToCenterChild"
  override protected def bridge(h: Long, i: Int): AnyRef = H3Bridge.cellToCenterChild(h, i)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class H3CellToChildren(left: Expression, right: Expression) extends H3BinaryIntExpr {
  override def prettyName: String = "h3_cell_to_children"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def bridgeName: String = "cellToChildren"
  override protected def bridge(h: Long, i: Int): AnyRef = H3Bridge.cellToChildren(h, i)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class H3CellToChildrenSize(left: Expression, right: Expression) extends H3BinaryIntExpr {
  override def prettyName: String = "h3_cell_to_children_size"
  override def dataType: DataType = LongType
  override protected def bridgeName: String = "cellToChildrenSize"
  override protected def bridge(h: Long, i: Int): AnyRef = H3Bridge.cellToChildrenSize(h, i)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Uncompaction fan-out: `h3_change_resolution` of the reference (C2) —
  * coarser target -> NULL is not possible here; finer-than-target -> NULL
  * row (dropped by the uncompact DataFrame op). */
case class H3UncompactCell(left: Expression, right: Expression) extends H3BinaryIntExpr {
  override def prettyName: String = "h3_uncompact_cell"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def bridgeName: String = "uncompactCell"
  override protected def bridge(h: Long, i: Int): AnyRef = H3Bridge.uncompactCell(h, i)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class H3DirectionToParentResolution(left: Expression, right: Expression) extends H3BinaryIntExpr {
  override def prettyName: String = "h3_direction_to_parent"
  override def dataType: DataType = IntegerType
  override protected def bridgeName: String = "directionToParentResolution"
  override protected def bridge(h: Long, i: Int): AnyRef =
    H3Bridge.directionToParentResolution(h, i)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

// ---- misc (S22, S23) -------------------------------------------------------

case class H3MaxGridDiskSize(child: Expression) extends UnaryExpression
    with ExpectsInputTypes with H3BridgeCodegen {
  override def prettyName: String = "h3_max_grid_disk_size"
  override def inputTypes: Seq[DataType] = Seq(IntegerType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def bridgeName: String = "maxGridDiskSize"
  override def nullSafeEval(v: Any): Any = H3Bridge.maxGridDiskSize(v.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => genNullableBridge(ctx, ev, c))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The 122 res-0 cells as a literal array (S22). Foldable leaf — constant
  * folding turns it into a Literal before execution, so the CodegenFallback
  * never appears in a hot path. */
case class H3Res0Cells() extends LeafExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "h3_res0_cells"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = H3Bridge.res0Cells()
}
