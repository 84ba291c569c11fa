package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON predicate DSL → Spark `Column` compiler.
  *
  * Re-expresses the reference's filter language (reference:
  * sampling/samplers.py:232-297, filtered_sampling_guide.md:18-220):
  *
  *   - scalar value           → equality            `{"c": "USA"}`
  *   - JSON array             → IN-list (never a range) `{"c": [1,2,3]}`
  *   - operator dict          → equals | in_list | gt | lt | between | range
  *                              `{"c": {"op":"between","min":0,"max":5}}`
  *   - "AND" / "OR" keys      → nested blocks, arbitrarily deep; bare keys at
  *                              a level combine with that level's connective
  *                              (top level = AND); an empty block matches all.
  *
  * The whole DSL compiles to `Column` boolean algebra — no UDF, no custom
  * Catalyst expression — so every predicate stays visible to the optimizer:
  * Catalyst pushes the compiled conjunctions/comparisons into the Parquet
  * scan (row-group stats pruning + partition pruning), which is what the
  * reference does by hand via PyArrow `dataset.scanner(filter=...)`.
  */
object FilterDsl {

  // ---------------------------------------------------------------- AST
  sealed trait Node
  sealed trait Connective
  case object And extends Connective
  case object Or extends Connective

  /** A block of conditions/sub-blocks joined by one connective. */
  final case class Group(conn: Connective, children: Seq[Node]) extends Node

  sealed trait Scalar { def toLit: Column }
  final case class SStr(v: String) extends Scalar { def toLit: Column = lit(v) }
  final case class SLong(v: Long) extends Scalar { def toLit: Column = lit(v) }
  final case class SDouble(v: Double) extends Scalar { def toLit: Column = lit(v) }
  final case class SBool(v: Boolean) extends Scalar { def toLit: Column = lit(v) }

  sealed trait Cond extends Node { def column: String }
  final case class Equals(column: String, value: Scalar) extends Cond
  final case class InList(column: String, values: Seq[Scalar]) extends Cond
  final case class Gt(column: String, value: Scalar) extends Cond
  final case class Lt(column: String, value: Scalar) extends Cond
  final case class Between(column: String, lo: Scalar, hi: Scalar) extends Cond

  // ------------------------------------------------------------- parsing
  /** Parse a JSON filter string into the AST.
    * @throws IllegalArgumentException on malformed JSON or invalid condition
    *         shapes (mirrors the reference's ValueError contract,
    *         main.py:124-127, samplers.py:201-220,259).
    */
  def parse(json: String): Node = {
    val jv =
      try JsonMethods.parse(json)
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(s"Invalid JSON filter: ${e.getMessage}")
      }
    jv match {
      case o: JObject => parseBlock(o, And)
      case _ => throw new IllegalArgumentException("Filter must be a JSON object")
    }
  }

  private def parseBlock(obj: JObject, conn: Connective): Group = {
    // duplicate JSON keys: keep the LAST occurrence, matching Python's
    // json.loads dict semantics in the reference (main.py:124-127) —
    // json4s would otherwise surface both and silently AND them
    val lastWins = obj.obj.reverse.distinctBy(_._1).reverse
    val children = lastWins.map {
      case ("AND", v) => parseBlock(asObject("AND", v), And)
      case ("OR", v)  => parseBlock(asObject("OR", v), Or)
      case (col, v)   => parseCond(col, v)
    }
    Group(conn, children)
  }

  private def asObject(key: String, v: JValue): JObject = v match {
    case o: JObject => o
    case other =>
      throw new IllegalArgumentException(
        s"'$key' block must be a JSON object, got: ${JsonMethods.compact(other)}")
  }

  private def parseCond(column: String, v: JValue): Cond = v match {
    case s: JString => Equals(column, scalar(column, s))
    case n @ (_: JInt | _: JLong | _: JDouble | _: JDecimal) =>
      Equals(column, scalar(column, n))
    case b: JBool   => Equals(column, scalar(column, b))
    case JArray(vs) => InList(column, vs.map(scalar(column, _)))
    case o: JObject =>
      val fields = o.obj.toMap
      fields.get("op") match {
        case Some(JString("equals")) => Equals(column, scalar(column, req(fields, column, "value")))
        case Some(JString("in_list")) =>
          req(fields, column, "values") match {
            case JArray(vs) => InList(column, vs.map(scalar(column, _)))
            case other => fail(column, s"'values' must be an array, got ${JsonMethods.compact(other)}")
          }
        case Some(JString("gt")) => Gt(column, scalar(column, req(fields, column, "value")))
        case Some(JString("lt")) => Lt(column, scalar(column, req(fields, column, "value")))
        case Some(JString(op)) if op == "between" || op == "range" =>
          Between(column, scalar(column, req(fields, column, "min")),
            scalar(column, req(fields, column, "max")))
        case Some(JString(op)) => fail(column, s"unknown op '$op'")
        case _ => fail(column, "operator dict requires an 'op' string")
      }
    case other => fail(column, s"invalid condition: ${JsonMethods.compact(other)}")
  }

  private def req(fields: Map[String, JValue], column: String, key: String): JValue =
    fields.getOrElse(key, fail(column, s"missing '$key'"))

  private def scalar(column: String, v: JValue): Scalar = v match {
    case JString(s)  => SStr(s)
    case JInt(i)     => SLong(i.longValue)
    case JLong(l)    => SLong(l)
    case JDouble(d)  => SDouble(d)
    case JDecimal(d) => SDouble(d.doubleValue)
    case JBool(b)    => SBool(b)
    case other => fail(column, s"invalid scalar: ${JsonMethods.compact(other)}")
  }

  private def fail(column: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"Invalid condition for $column: $msg")

  // ---------------------------------------------------------- validation
  /** Every column referenced anywhere in the filter tree
    * (reference samplers.py:223-231 — there it feeds the manual projection
    * union; here Catalyst prunes automatically, so this is validation-only).
    */
  def referencedColumns(node: Node): Set[String] = node match {
    case Group(_, cs) => cs.flatMap(referencedColumns).toSet
    case c: Cond      => Set(c.column)
  }

  /** Reject unknown columns before execution (samplers.py:201-220). */
  def validate(node: Node, schemaColumns: Seq[String]): Unit = {
    val unknown = referencedColumns(node) -- schemaColumns.toSet
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"Filter references unknown columns: ${unknown.toSeq.sorted.mkString(", ")}")
  }

  // --------------------------------------------------------- compilation
  /** Compile the AST to a Spark `Column`.
    *
    * Empty blocks are *skipped*, exactly like the reference's
    * `_build_expression` returning `None` for an empty sub-block
    * (samplers.py:263-297): `{"OR": {"a": 1, "AND": {}}}` compiles to
    * `a = 1`, NOT to `a = 1 OR true`. Only a fully-empty top-level filter
    * is match-all (`lit(true)`, samplers.py:270-271). */
  def compile(node: Node): Column = compileOpt(node).getOrElse(lit(true))

  /** `None` ⇔ the node contributes no predicate (empty block, recursively). */
  private def compileOpt(node: Node): Option[Column] = node match {
    case Group(conn, children) =>
      children.flatMap(compileOpt) match {
        case Seq() => None
        case cols => Some(conn match {
          case And => cols.reduce(_ && _)
          case Or  => cols.reduce(_ || _)
        })
      }
    case Equals(c, v)      => Some(col(c) === v.toLit)
    case InList(c, vs)     => Some(col(c).isin(vs.map(_.toLit): _*))
    case Gt(c, v)          => Some(col(c) > v.toLit)
    case Lt(c, v)          => Some(col(c) < v.toLit)
    case Between(c, lo, hi) => Some(col(c) >= lo.toLit && col(c) <= hi.toLit)
  }

  /** Parse + validate against a schema + compile, in one step. */
  def toColumn(json: String, schemaColumns: Seq[String]): Column = {
    val ast = parse(json)
    validate(ast, schemaColumns)
    compile(ast)
  }
}
