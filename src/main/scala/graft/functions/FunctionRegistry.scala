package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.compiler.ExpressionCompiler
import graft.parser.CypherAst.{Expr, MapLit, StrLit}

/** Cypher scalar/aggregate function registry — the Spark counterpart of
  * the reference's `ScalarFunctionRegistry`
  * (/root/reference/packages/pycypher/src/pycypher/scalar_functions/
  * __init__.py:66-230; inventory in the module docstring :31-60).
  * Every builder returns a codegen'd native `Column` expression; user
  * functions register through `registerUdf` into the same namespace.
  */
object FunctionRegistry {

  type Builder = (Seq[Column], Seq[Expr], ExpressionCompiler) => Column

  private val aggregates = Set(
    "count", "sum", "avg", "min", "max", "collect", "stdev", "stdevp",
    "percentilecont", "percentiledisc")

  def isAggregate(name: String): Boolean = aggregates.contains(name.toLowerCase)

  /** Aggregate call → Column (used by the projection planner).
    * Note on `min`/`max`: Cypher reuses the names as list functions;
    * the planner routes here only in aggregation context.
    */
  def aggregate(name: String, args: Seq[Column], distinct: Boolean): Column =
    (name.toLowerCase, distinct) match {
      case ("count", false) => count(args.head)
      case ("count", true)  => countDistinct(args.head)
      case ("sum", false)   => sum(args.head)
      case ("sum", true)    => sum_distinct(args.head)
      case ("avg", false)   => avg(args.head)
      case ("avg", true)    => avg(args.head) // DISTINCT avg: rare; approximate
      case ("min", _)       => min(args.head)
      case ("max", _)       => max(args.head)
      case ("collect", false) => collect_list(args.head)
      case ("collect", true)  => collect_set(args.head)
      case ("stdev", _)     => stddev_samp(args.head)
      case ("stdevp", _)    => stddev_pop(args.head)
      case ("percentilecont", _) => percentile(args.head, args(1))
      case ("percentiledisc", _) =>
        // EXACT inverse-distribution percentile (the reference computes
        // discrete percentiles exactly — aggregation_evaluator.py:
        // 95-135, 498-510). The former percentile_approx(…, 1e6)
        // compilation is exact only while a group holds ≲1M values —
        // beyond that the sketch may return a neighboring element, a
        // silent divergence exactly where a 100 TB corpus lives. The
        // sketch stays available as an explicit opt-in for groups where
        // a bounded-memory merge matters more than exactness.
        if (org.apache.spark.sql.SparkSession.getActiveSession.exists(
          _.conf.get("graft.percentileDisc.approx", "false").toBoolean))
          percentile_approx(args.head, args(1), lit(1000000))
        else org.apache.spark.sql.graftshim.ColumnBridge.column(
          org.apache.spark.sql.catalyst.expressions.aggregate.PercentileDisc(
            org.apache.spark.sql.graftshim.ColumnBridge.expression(args.head),
            org.apache.spark.sql.graftshim.ColumnBridge.expression(args(1)))
            .toAggregateExpression())
      case (other, _) => throw new IllegalArgumentException(s"unknown aggregate $other")
    }

  // ----- duration type (temporal_functions.py:110-613) -----
  // Represented as struct(months, days, micros) — the same three-field
  // shape as Spark's CalendarInterval, so datetime ± duration lowers to
  // a native make_interval addition (codegen'd, no UDF).

  val DurationFields: Seq[String] = Seq("months", "days", "micros")

  def isDurationType(t: DataType): Boolean = t match {
    case st: StructType => st.fieldNames.toSeq == DurationFields
    case _              => false
  }

  def durationStruct(months: Column, days: Column, micros: Column): Column =
    struct(months.cast(LongType).as("months"), days.cast(LongType).as("days"),
      micros.cast(LongType).as("micros"))

  def durationToInterval(d: Column): Column =
    make_interval(lit(0), d.getField("months").cast(IntegerType), lit(0),
      d.getField("days").cast(IntegerType), lit(0), lit(0),
      (d.getField("micros") / lit(1000000.0)).cast(DecimalType(18, 6)))

  /** Comparison basis: months normalize to 30 days (the reference's
    * estimation convention for ordering durations; exact calendar
    * ordering is undefined for mixed-unit durations in openCypher).
    */
  def durationTotalMicros(d: Column): Column =
    d.getField("months") * lit(2592000000000L) +
      d.getField("days") * lit(86400000000L) + d.getField("micros")

  private val IsoDuration = Pattern.compile(
    """^P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?""" +
      """(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$""")

  /** ISO-8601 duration string → (months, days, micros). */
  def parseIsoDuration(s: String): (Long, Long, Long) = {
    val m = IsoDuration.matcher(s.trim)
    require(m.matches() && s.length > 1, s"bad ISO duration: $s")
    def g(i: Int): Long = Option(m.group(i)).map(_.toLong).getOrElse(0L)
    val secs = Option(m.group(7)).map(BigDecimal(_)).getOrElse(BigDecimal(0))
    val months = g(1) * 12 + g(2)
    val days = g(3) * 7 + g(4)
    val micros = g(5) * 3600000000L + g(6) * 60000000L +
      (secs * 1000000).toLong
    (months, days, micros)
  }

  private val userFns =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Column] => Column]

  /** Plugin registration, mirroring `ScalarFunctionRegistry.register`. */
  def registerUdf(name: String, fn: Seq[Column] => Column): Unit =
    userFns.put(name.toLowerCase, fn)

  def scalar(name: String, args: Seq[Column], raw: Seq[Expr],
             ec: ExpressionCompiler, env: Map[String, Column]): Column = {
    val n = name.toLowerCase
    userFns.get(n).foreach(f => return f(args))
    def a0 = args.head
    def a1 = args(1)
    n match {
      // ----- string (reference: extended_string_functions.py, __init__.py:464-583)
      case "toupper" | "upper"   => upper(a0)
      case "tolower" | "lower"   => lower(a0)
      case "trim"                => trim(a0)
      case "ltrim"               => ltrim(a0)
      case "rtrim"               => rtrim(a0)
      case "btrim"               => if (args.size > 1) btrim(a0, a1) else btrim(a0)
      case "substring" =>
        // Cypher substring(s, start[, len]) is 0-based; Spark is 1-based.
        if (args.size > 2) a0.substr(a1.cast(IntegerType) + 1, args(2).cast(IntegerType))
        else a0.substr(a1.cast(IntegerType) + 1, length(a0))
      case "left"                => a0.substr(lit(1), a1.cast(IntegerType))
      case "right"               => a0.substr(length(a0) - a1.cast(IntegerType) + 1, a1.cast(IntegerType))
      case "replace" => raw(1) match {
        case StrLit(s) => regexp_replace(a0, Pattern.quote(s), rawStr(raw(2)).getOrElse(""))
        case _         => regexp_replace(a0, a1, args(2)) // non-literal: regex semantics
      }
      case "split" => raw(1) match {
        case StrLit(s) => split(a0, Pattern.quote(s))
        case _         => split(a0, a1.toString)
      }
      case "join"                => array_join(a0, rawStr(raw(1)).getOrElse(","))
      case "reverse"             => reverse(a0)
      case "normalize" =>
        // Unicode normalization via a native codegen'd expression; the
        // form must be a literal (it bakes into the generated code)
        val form =
          if (args.size > 1) rawStr(raw(1)).getOrElse(
            throw new IllegalArgumentException(
              "normalize: normalForm must be a string literal"))
          else "NFC"
        org.apache.spark.sql.graftshim.ColumnBridge.column(
          UnicodeNormalize(
            org.apache.spark.sql.graftshim.ColumnBridge.expression(a0), form))
      case "length" | "size" | "char_length" =>
        ec.typeOf(a0) match {
          case Some(_: ArrayType) => size(a0)
          case _                  => length(a0)
        }
      case "isempty"             => ec.typeOf(a0) match {
        case Some(_: ArrayType) => size(a0) === 0
        case _                  => length(a0) === 0
      }
      case "lpad" =>
        if (args.size > 2) lpad(a0, rawInt(raw(1)), rawStr(raw(2)).getOrElse(" "))
        else lpad(a0, rawInt(raw(1)), " ")
      case "rpad" =>
        if (args.size > 2) rpad(a0, rawInt(raw(1)), rawStr(raw(2)).getOrElse(" "))
        else rpad(a0, rawInt(raw(1)), " ")
      case "repeat"              => repeat(a0, a1.cast(IntegerType))
      case "indexof"             => instr(a0, rawStr(raw(1)).getOrElse("")) - 1 // Cypher 0-based, -1 missing
      case "charat"              => a0.substr(a1.cast(IntegerType) + 1, lit(1))
      case "char"                => chr(a0)
      case "charcodeat"          => ascii(a0.substr(a1.cast(IntegerType) + 1, lit(1)))
      case "startswith"          => a0.startsWith(a1)
      case "endswith"            => a0.endsWith(a1)
      case "contains"            => a0.contains(a1)
      case "bytesize"            => octet_length(a0)

      // ----- conversions (conversion_functions.py:114-372)
      case "tostring" | "str"    => a0.cast(StringType)
      case "tostringornull"      => a0.cast(StringType)
      case "tointeger" | "int"   => toIntegerCol(a0, ec)
      case "tointegerornull"     => toIntegerCol(a0, ec)
      case "tofloat" | "float"   => a0.cast(DoubleType)
      case "tofloatornull"       => a0.cast(DoubleType)
      case "toboolean" | "bool"  => a0.cast(BooleanType)
      case "tobooleanornull"     => a0.cast(BooleanType)

      // ----- math (math_functions.py:80-533)
      case "abs"      => abs(a0)
      case "ceil"     => ceil(a0).cast(DoubleType)
      case "floor"    => floor(a0).cast(DoubleType)
      case "round" =>
        // Neo4j 5.x: round(x[, precision[, mode]]) with seven rounding
        // modes (reference module docstring :25-28). All modes compile
        // to native column arithmetic on the scaled value.
        if (args.size <= 1) round(a0, 0)
        else if (args.size == 2) round(a0, rawInt(raw(1)))
        else {
          val p = rawInt(raw(1))
          val s = lit(math.pow(10, p))
          val y = abs(a0) * s
          val mag = rawStr(raw(2)).getOrElse("HALF_UP").toUpperCase match {
            case "HALF_UP"   => floor(y + 0.5)
            case "HALF_DOWN" => when(y - floor(y) > 0.5, ceil(y)).otherwise(floor(y))
            case "HALF_EVEN" => bround(y, 0)
            case "UP"        => ceil(y)
            case "DOWN"      => floor(y)
            case "CEILING"   => when(a0 >= 0, ceil(y)).otherwise(floor(y))
            case "FLOOR"     => when(a0 >= 0, floor(y)).otherwise(ceil(y))
            case other => throw new IllegalArgumentException(s"round mode $other")
          }
          signum(a0) * mag / s
        }
      case "sign"     => signum(a0)
      case "sqrt"     => sqrt(a0)
      case "cbrt"     => cbrt(a0)
      case "exp"      => exp(a0)
      case "log"      => log(a0)
      case "log2"     => log2(a0)
      case "log10"    => log10(a0)
      case "cot"      => lit(1.0) / tan(a0)
      case "haversin" => pow(sin(a0 / 2), 2)
      case "hypot"    => hypot(a0, a1)
      case "fmod"     => a0 % a1
      case "pow"      => pow(a0, a1)
      case "gcd"      => expr_gcd(a0, a1)
      case "lcm"      => abs(a0 * a1) / expr_gcd(a0, a1)
      case "bitand"   => a0.bitwiseAND(a1)
      case "bitor"    => a0.bitwiseOR(a1)
      case "bitxor"   => a0.bitwiseXOR(a1)
      case "bitnot"   => bitwise_not(a0.cast(LongType))
      case "bitshiftleft"  => shiftleft(a0, rawInt(raw(1)))
      case "bitshiftright" => shiftright(a0, rawInt(raw(1)))

      // ----- trig & constants (list_functions.py:313-471, math_functions.py:276-308)
      case "sin" => sin(a0);   case "cos" => cos(a0);   case "tan" => tan(a0)
      case "asin" => asin(a0); case "acos" => acos(a0); case "atan" => atan(a0)
      case "atan2" => atan2(a0, a1)
      case "sinh" => sinh(a0); case "cosh" => cosh(a0); case "tanh" => tanh(a0)
      case "degrees" => degrees(a0)
      case "radians" => radians(a0)
      case "pi"   => lit(math.Pi)
      case "e"    => if (args.isEmpty) lit(math.E) else exp(a0)
      case "rand" => rand()
      case "randomuuid" => expr("uuid()")

      // ----- list (list_functions.py:71-795)
      case "head"    => element_at(a0, 1)
      case "last"    => element_at(a0, -1)
      case "tail"    => slice(a0, lit(2), greatest(size(a0) - 1, lit(0)))
      case "range" =>
        if (args.size > 2) sequence(a0, a1, args(2))
        else sequence(a0, a1)
      case "sort"    => array_sort(a0)
      case "flatten" => flatten(a0)
      case "tolist"  => a0
      case "tostringlist"  => transform(a0, _.cast(StringType))
      case "tointegerlist" => transform(a0, _.cast(LongType))
      case "tofloatlist"   => transform(a0, _.cast(DoubleType))
      case "tobooleanlist" => transform(a0, _.cast(BooleanType))
      // scalar min/max over a list argument (dual-purpose names)
      case "array_min" => array_min(a0)
      case "array_max" => array_max(a0)

      // ----- maps / introspection
      case "keys" => ec.typeOf(a0) match {
        case Some(_: MapType)     => map_keys(a0)
        case Some(s: StructType)  => array(s.fieldNames.map(lit): _*)
        case _                    => lit(null)
      }
      case "values" => ec.typeOf(a0) match {
        case Some(_: MapType) => map_values(a0)
        case _                => lit(null)
      }
      case "properties" => a0
      case "valuetype" | "typeof" =>
        ec.typeOf(a0).map(t => lit(cypherTypeName(t))).getOrElse(lit("ANY"))
      case "isstring"  => typeIs(a0, ec) { case StringType => true }
      case "isinteger" => typeIs(a0, ec) {
        case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
      }
      case "isfloat"   => typeIs(a0, ec) { case _: FloatType | _: DoubleType => true }
      case "isboolean" => typeIs(a0, ec) { case BooleanType => true }
      case "islist"    => typeIs(a0, ec) { case _: ArrayType => true }
      case "ismap"     => typeIs(a0, ec) { case _: MapType | _: StructType => true }

      // ----- temporal (temporal_functions.py:110-613)
      case "date" =>
        if (args.isEmpty) current_date() else to_date(a0)
      case "datetime" | "localdatetime" =>
        if (args.isEmpty) current_timestamp() else to_timestamp(a0)
      case "localdate"  => if (args.isEmpty) current_date() else to_date(a0)
      case "localtime"  => date_format(current_timestamp(), "HH:mm:ss")
      case "timestamp"  => (unix_timestamp() * 1000)
      case "date.truncate" | "datetime.truncate" | "localdatetime.truncate" =>
        date_trunc(rawStr(raw.head).getOrElse("day"), a1)
      case "duration" => raw.head match {
        case StrLit(s) =>
          val (m, d, us) = parseIsoDuration(s)
          durationStruct(lit(m), lit(d), lit(us))
        case MapLit(items) =>
          val fields = items.toMap
          def f(k: String, scale: Long): Column = fields.get(k)
            .map(e => ec.compileEnv(e, env).cast(LongType) * lit(scale)).getOrElse(lit(0L))
          durationStruct(
            f("years", 12) + f("months", 1),
            f("weeks", 7) + f("days", 1),
            f("hours", 3600000000L) + f("minutes", 60000000L) +
              f("seconds", 1000000L) + f("milliseconds", 1000L) +
              f("microseconds", 1L))
        case other => throw new IllegalArgumentException(
          s"duration() needs an ISO string or unit map literal, got $other")
      }
      case "duration.between" =>
        // pure elapsed time (micros), not calendar components — the
        // reference's between() decomposes into months/days; ordering and
        // arithmetic agree for the pure form
        durationStruct(lit(0L), lit(0L),
          unix_micros(a1.cast(TimestampType)) - unix_micros(a0.cast(TimestampType)))

      // ----- hash / encoding (__init__.py:971-1003)
      case "md5"    => md5(a0.cast(BinaryType))
      case "sha1"   => sha1(a0.cast(BinaryType))
      case "sha256" => sha2(a0.cast(BinaryType), 256)
      case "encodebase64" => base64(a0.cast(BinaryType))
      case "decodebase64" => unbase64(a0).cast(StringType)

      // ----- utility (utility_functions.py:68-334)
      case "coalesce"   => coalesce(args: _*)
      case "nullif"     => nullif(a0, a1)
      case "isnan"      => isnan(a0)
      case "infinity"   => lit(Double.PositiveInfinity)
      case "isinfinite" => a0 === lit(Double.PositiveInfinity) || a0 === lit(Double.NegativeInfinity)
      case "isfinite"   => !isnan(a0) && a0 =!= lit(Double.PositiveInfinity) && a0 =!= lit(Double.NegativeInfinity)
      case "exists"     => a0.isNotNull
      case "now"        => current_timestamp()
      case "len"        => ec.typeOf(a0) match {
        case Some(_: ArrayType) => size(a0)
        case _                  => length(a0)
      }

      case other => throw new IllegalArgumentException(s"unknown function: $other")
    }
  }

  private def rawStr(e: Expr): Option[String] = e match {
    case StrLit(s) => Some(s); case _ => None
  }
  private def rawInt(e: Expr): Int = e match {
    case graft.parser.CypherAst.IntLit(v) => v.toInt
    case _ => throw new IllegalArgumentException("expected integer literal argument")
  }

  private def toIntegerCol(c: Column, ec: ExpressionCompiler): Column =
    ec.typeOf(c) match {
      case Some(StringType) => c.cast(DoubleType).cast(LongType) // "3.7" -> 3
      case _                => c.cast(LongType)
    }

  private def typeIs(c: Column, ec: ExpressionCompiler)(
    pf: PartialFunction[DataType, Boolean]): Column =
    lit(ec.typeOf(c).exists(t => pf.applyOrElse(t, (_: DataType) => false)))

  private def cypherTypeName(t: DataType): String = t match {
    case StringType => "STRING"
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => "INTEGER"
    case _: FloatType | _: DoubleType => "FLOAT"
    case BooleanType => "BOOLEAN"
    case _: ArrayType => "LIST"
    case _: MapType | _: StructType => "MAP"
    case _: DateType => "DATE"
    case _: TimestampType => "DATETIME"
    case NullType => "NULL"
    case other => other.simpleString.toUpperCase
  }

  /** gcd via iteration-free absolute remainder chain is not expressible
    * with native functions; use the Euclid identity on a bounded unroll
    * (sufficient for 64-bit inputs ~ 90 iterations worst case is too
    * deep; 32 covers all practical magnitudes seen in data pipelines).
    */
  private def expr_gcd(a: Column, b: Column): Column = {
    var x = abs(a.cast(LongType))
    var y = abs(b.cast(LongType))
    (0 until 32).foreach { _ =>
      val nx = when(y === 0, x).otherwise(y)
      val ny = when(y === 0, lit(0L)).otherwise(x % y)
      x = nx; y = ny
    }
    x
  }
}
