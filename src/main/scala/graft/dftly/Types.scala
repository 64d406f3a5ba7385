package graft.dftly

import org.apache.spark.sql.types._

/** The dftly cast-name vocabulary (reference: src/dftly/nodes/types.py:1-77).
  *
  * Spark has no unsigned integers, so unsigned names widen to the next signed
  * type that can hold them losslessly (uint64 → DECIMAL(20,0)); `float` is
  * 32-bit, matching the reference alias table verbatim (SURVEY.md §1.3).
  */
object Types {

  /** Dtype casts: dftly type name → Spark DataType. */
  val DTYPES: Map[String, DataType] = Map(
    "uint8"   -> ShortType,
    "uint16"  -> IntegerType,
    "uint"    -> LongType,
    "uint32"  -> LongType,
    "uint64"  -> DecimalType(20, 0),
    "int8"    -> ByteType,
    "int16"   -> ShortType,
    "int"     -> IntegerType,
    "int32"   -> IntegerType,
    "integer" -> IntegerType,
    "int64"   -> LongType,
    "long"    -> LongType,
    "int128"  -> DecimalType(38, 0),
    "float"   -> FloatType,
    "float32" -> FloatType,
    "float64" -> DoubleType,
    "double"  -> DoubleType,
    "bool"    -> BooleanType,
    "boolean" -> BooleanType,
    "str"     -> StringType,
    "string"  -> StringType,
    "utf8"    -> StringType,
    "date"    -> DateType,
    // dftly datetimes are timezone-naive (Polars µs default) → TimestampNTZ.
    "datetime" -> TimestampNTZType,
    "duration" -> DayTimeIntervalType(DayTimeIntervalType.DAY, DayTimeIntervalType.SECOND),
    "time"     -> TimeType(6)
  )

  // Exact constants from reference: types.py:47-51. Months/years are
  // deliberately approximate (30.4375 / 365.25 days) — replicated verbatim.
  val SECONDS_PER_MINUTE: Long = 60L
  val SECONDS_PER_HOUR: Long   = 60L * SECONDS_PER_MINUTE
  val SECONDS_PER_DAY: Long    = 24L * SECONDS_PER_HOUR
  val SECONDS_PER_YEAR: Double  = 365.25 * SECONDS_PER_DAY
  val SECONDS_PER_MONTH: Double = SECONDS_PER_YEAR / 12.0

  /** Implicit duration-constructor unit → seconds-per-unit (as a Double so
    * sub-second units pass fractional seconds to make_dt_interval; reference:
    * types.py:53-64).
    */
  val DURATION_UNIT_SECONDS: Map[String, Double] = Map(
    "nanoseconds"  -> 1e-9,
    "microseconds" -> 1e-6,
    "milliseconds" -> 1e-3,
    "seconds"      -> 1.0,
    "minutes"      -> SECONDS_PER_MINUTE.toDouble,
    "hours"        -> SECONDS_PER_HOUR.toDouble,
    "days"         -> SECONDS_PER_DAY.toDouble,
    "weeks"        -> (7L * SECONDS_PER_DAY).toDouble,
    "months"       -> SECONDS_PER_MONTH,
    "years"        -> SECONDS_PER_YEAR
  )

  /** Implicit date-constructor units (reference: types.py:66-68). */
  val DATE_UNITS: Set[String] = Set("year")

  /** All legal cast-target names (reference: types.py:70-77). */
  val TYPES: Set[String] =
    DTYPES.keySet ++ DURATION_UNIT_SECONDS.keySet ++ DATE_UNITS

  /** Whether `name` lowers to a real dtype `.cast()` rather than an implicit
    * unit builder (reference: types.py:303-312).
    */
  def lowersToCast(name: String): Boolean =
    !DURATION_UNIT_SECONDS.contains(name) && !DATE_UNITS.contains(name)
}
