package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** pandas `.dt.*` accessor surface (reference `_datetime.py:18-74`),
  * mapped to Spark's datetime functions.  All codegen'd builtins.
  */
object DtFunctions {

  // properties (`_datetime.py:36-74`)
  def year_(c: Column): Column = year(c)
  def month_(c: Column): Column = month(c)
  def day_(c: Column): Column = dayofmonth(c)
  def hour_(c: Column): Column = hour(c)
  def minute_(c: Column): Column = minute(c)
  def second_(c: Column): Column = second(c)
  def microsecond(c: Column): Column = pmod(unix_micros(c.cast("timestamp")), lit(1000000L)).cast("int") // pmod: pre-epoch stays in [0, 1e6)
  def dayofweek(c: Column): Column = weekday(c) // pandas: Monday=0
  def dayofyear(c: Column): Column = org.apache.spark.sql.functions.dayofyear(c)
  def weekofyear_(c: Column): Column = weekofyear(c)
  def quarter_(c: Column): Column = quarter(c)
  def daysInMonth(c: Column): Column = dayofmonth(last_day(c))
  def isMonthStart(c: Column): Column = dayofmonth(c) === 1
  def isMonthEnd(c: Column): Column = to_date(c) === last_day(c)
  def isQuarterStart(c: Column): Column = (dayofmonth(c) === 1) && (month(c) % 3 === 1)
  def isQuarterEnd(c: Column): Column =
    (to_date(c) === last_day(c)) && (month(c) % 3 === 0)
  def isYearStart(c: Column): Column = (dayofmonth(c) === 1) && (month(c) === 1)
  def isYearEnd(c: Column): Column = (dayofmonth(c) === 31) && (month(c) === 12)
  def date_(c: Column): Column = to_date(c)

  // methods (`_datetime.py:18-33`)
  def floor(c: Column, unit: String): Column = date_trunc(unit, c)
  def normalize(c: Column): Column = date_trunc("day", c)
  // exact integer floor division: `/` on longs is DOUBLE division and
  // cast("long") truncates toward zero, which mis-rounds pre-epoch
  // (negative) microsecond values; (a - pmod(a, b)) is exactly divisible
  private def floorDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")
  def ceil(c: Column, seconds: Long): Column = {
    val us = lit(seconds * 1000000L)
    timestamp_micros(floorDiv(unix_micros(c.cast("timestamp")) + us - 1, us) * us)
  }
  def roundTo(c: Column, seconds: Long): Column = {
    val us = lit(seconds * 1000000L)
    timestamp_micros(floorDiv(unix_micros(c.cast("timestamp")) + us / 2, us) * us)
  }
  def strftime(c: Column, javaFormat: String): Column = date_format(c, javaFormat)
  def dayName(c: Column): Column = date_format(c, "EEEE")
  def monthName(c: Column): Column = date_format(c, "MMMM")
  def isocalendarWeek(c: Column): Column = weekofyear(c)
  def totalSeconds(interval: Column): Column =
    interval.cast("long") // DayTimeIntervalType casts to seconds
  def tzLocalize(c: Column, tz: String): Column = to_utc_timestamp(c, tz)
  def tzConvert(c: Column, tz: String): Column = from_utc_timestamp(c, tz)
  def toPeriodMonth(c: Column): Column = date_format(c, "yyyy-MM")

  /** pandas `to_timedelta(seconds)` — a DayTimeIntervalType duration. */
  def toTimedelta(seconds: Column): Column =
    make_dt_interval(lit(0), lit(0), lit(0), seconds.cast("double"))
}
