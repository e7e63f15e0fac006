package graft.functions

import graft.functions.expr.{GraftCosine, GraftDot, GraftLshBucket, GraftNorm2}
import org.apache.spark.sql.{Column, GraftSqlBridge => B}

/** Column-API surface for the native codegen vector expressions
  * ([[graft.functions.expr.VectorExprs]]) — drop-in replacements for the
  * HOF forms in [[VectorFunctions]] with identical arithmetic (same
  * element order, double accumulation, NULL-not-NaN), but compiled to a
  * primitive loop inside whole-stage codegen instead of an interpreted
  * lambda tree per element.
  */
object VectorNative {

  def dot(a: Column, b: Column): Column =
    B.column(GraftDot(B.expression(a), B.expression(b)))

  def norm2(a: Column): Column =
    B.column(GraftNorm2(B.expression(a)))

  def cosine(a: Column, b: Column): Column =
    B.column(GraftCosine(B.expression(a), B.expression(b)))

  def lshBucket(v: Column, dims: Int, nPlanes: Int): Column =
    B.column(GraftLshBucket(B.expression(v), dims, nPlanes))
}
