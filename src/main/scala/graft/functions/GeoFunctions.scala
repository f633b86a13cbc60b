package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Spatial predicates over WKT bbox columns — the one capability the reference
 * workload needs that neither engine ships natively (reference: README.md:3-16
 * describes the search; the GeoArrow WKT typing is attached at
 * src/schema.rs:57-74 but no spatial function is registered there).
 *
 * Implemented as Catalyst `Expression`s (not Scala UDFs) so null handling and
 * eval stay inside the expression framework; registered into the session
 * `FunctionRegistry` so both SQL and the `Column` helpers below work:
 *
 * {{{
 *   GeoFunctions.register(spark)
 *   df.filter(GeoFunctions.bbox_intersects(col("bbox"), 15, 15, 25, 25))
 *   spark.sql("SELECT * FROM t WHERE bbox_intersects(bbox, 15, 15, 25, 25)")
 * }}}
 */
object GeoFunctions {

  /** bbox_envelope(wkt) → struct<minx,miny,maxx,maxy> (null for empty geometry). */
  case class BboxEnvelope(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("minx", DoubleType, nullable = false),
      StructField("miny", DoubleType, nullable = false),
      StructField("maxx", DoubleType, nullable = false),
      StructField("maxy", DoubleType, nullable = false)))
    override def nullSafeEval(v: Any): Any = {
      val e = Wkt.envelope(v.asInstanceOf[UTF8String].toString)
      if (e == null) null else InternalRow(e(0), e(1), e(2), e(3))
    }
    override def prettyName: String = "bbox_envelope"
    override protected def withNewChildInternal(c: Expression): BboxEnvelope = copy(child = c)
  }

  /** bbox_intersects(wkt, minx, miny, maxx, maxy) → boolean. */
  case class BboxIntersects(children: Seq[Expression]) extends Expression with CodegenFallback {
    require(children.length == 5, "bbox_intersects(wkt, minx, miny, maxx, maxy)")
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = children.exists(_.nullable)
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.contains(null)) null
      else {
        def d(a: Any): Double = a match {
          case x: Double => x; case x: Float => x.toDouble
          case x: Int => x.toDouble; case x: Long => x.toDouble
          case x: java.math.BigDecimal => x.doubleValue()
          case x: org.apache.spark.sql.types.Decimal => x.toDouble
          case x => x.toString.toDouble
        }
        Wkt.envelopeIntersects(vs.head.asInstanceOf[UTF8String].toString,
          d(vs(1)), d(vs(2)), d(vs(3)), d(vs(4)))
      }
    }
    override def prettyName: String = "bbox_intersects"
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BboxIntersects =
      copy(children = cs)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bbox_envelope",
      (es: Seq[Expression]) => BboxEnvelope(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("bbox_intersects",
      (es: Seq[Expression]) => BboxIntersects(es), "scala_udf")
  }

  /** Column helpers (require `register(spark)` on the active session). */
  def bbox_envelope(wkt: Column): Column = call_function("bbox_envelope", wkt)
  def bbox_intersects(wkt: Column, minx: Column, miny: Column, maxx: Column, maxy: Column): Column =
    call_function("bbox_intersects", wkt, minx, miny, maxx, maxy)
  def bbox_intersects(wkt: Column, minx: Double, miny: Double, maxx: Double, maxy: Double): Column = {
    import org.apache.spark.sql.functions.lit
    bbox_intersects(wkt, lit(minx), lit(miny), lit(maxx), lit(maxy))
  }
}
