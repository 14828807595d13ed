package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import graft.etl.binary.Base58

/** Engine scalar functions (SURVEY.md §2.10).
  *
  * base58 is the one scalar the reference needs that Spark lacks
  * (csv.rs:50-51, programs.rs:56). Deterministic Scala UDF — codegen treats
  * it as a black box but it stays inside whole-stage codegen spans as a
  * simple call; upgradeable to a Catalyst `UnaryExpression` if it ever shows
  * up hot in profiles (it is output-edge-only: encode happens at sink
  * projections, never in joins/filters).
  */
object functions {

  /** Base58-encode a binary column (deterministic UDF). */
  val base58: Column => Column = {
    val f = udf((b: Array[Byte]) => if (b == null) null else Base58.encode(b))
    (c: Column) => f(c)
  }

  /** Decode a base58 string column to binary. */
  val unbase58: Column => Column = {
    val f = udf((s: String) => if (s == null) null else Base58.decode(s))
    (c: Column) => f(c)
  }
}
