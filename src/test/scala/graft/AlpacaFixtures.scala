package graft

import java.nio.file.{Files, Path}
import java.time.{LocalDate, LocalTime, ZoneId, ZonedDateTime}
import java.time.format.DateTimeFormatter

/** Synthetic Alpaca-shaped raw payload files (FIXTURES.md A1) covering
  * the reference-cited behaviors: full RTH days with pre/post-market
  * and weekend noise, planted gap days, an early-close day, the
  * Nov-2025 DST fall-back boundary, null close / unparseable
  * timestamp / null volume bars, and pair asymmetry.
  */
object AlpacaFixtures {

  val ET: ZoneId = ZoneId.of("America/New_York")
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ssXXX")

  val FullDays: Seq[LocalDate] =
    Seq(LocalDate.parse("2025-10-31"), LocalDate.parse("2025-11-03"), LocalDate.parse("2025-11-04"))
  val EarlyCloseDay: LocalDate = LocalDate.parse("2025-11-28")
  val WeekendDay: LocalDate = LocalDate.parse("2025-11-01")

  /** ET slots a symbol is missing (planted gaps / null-close slots). */
  val MsftGaps: Set[(LocalDate, LocalTime)] = Set(
    (LocalDate.parse("2025-11-03"), LocalTime.of(11, 0)),
    (LocalDate.parse("2025-11-03"), LocalTime.of(11, 5)))
  val AaplNullCloseSlot: (LocalDate, LocalTime) =
    (LocalDate.parse("2025-10-31"), LocalTime.of(10, 0))
  val AaplGaps: Set[(LocalDate, LocalTime)] =
    (0 until 4).map(i => (LocalDate.parse("2025-11-04"), LocalTime.of(14, 0).plusMinutes(5L * i))).toSet

  def rthSlots(day: LocalDate, close: LocalTime = LocalTime.of(16, 0)): Seq[LocalTime] =
    Iterator.iterate(LocalTime.of(9, 30))(_.plusMinutes(5))
      .takeWhile(_.isBefore(close)).toSeq

  private def price(symbol: String, day: LocalDate, t: LocalTime): Double =
    100.0 + symbol.hashCode.abs % 50 +
      0.01 * (day.getDayOfYear % 30) + 0.001 * (t.toSecondOfDay / 300)

  private def barJson(symbol: String, day: LocalDate, t: LocalTime,
      nullClose: Boolean = false, badTs: Boolean = false, nullVolume: Boolean = false): String = {
    val ts = if (badTs) "\"not-a-timestamp\""
      else "\"" + ZonedDateTime.of(day, t, ET).format(fmt) + "\""
    val p = price(symbol, day, t)
    val close = if (nullClose) "null" else f"$p%.4f"
    val vol = if (nullVolume) "null" else ((p * 100).toLong % 100000).toString
    s"""{"timestamp": $ts, "open": ${f"$p%.4f"}, "high": ${f"${p + 0.5}%.4f"}, "low": ${f"${p - 0.5}%.4f"}, "close": $close, "volume": $vol}"""
  }

  /** Write one payload file per symbol; returns the directory. */
  def write(dir: Path): Path = {
    Files.createDirectories(dir)
    Seq("MSFT", "AAPL").foreach { sym =>
      val bars = scala.collection.mutable.ArrayBuffer[String]()
      FullDays.foreach { day =>
        rthSlots(day).foreach { t =>
          val gap = (sym == "MSFT" && MsftGaps((day, t))) ||
            (sym == "AAPL" && AaplGaps((day, t)))
          if (!gap) {
            val nullClose = sym == "AAPL" && (day, t) == AaplNullCloseSlot
            val nullVol = sym == "AAPL" && day == FullDays.head && t == LocalTime.of(9, 35)
            bars += barJson(sym, day, t, nullClose = nullClose, nullVolume = nullVol)
          }
        }
        // pre/post-market noise the RTH filter must drop
        bars += barJson(sym, day, LocalTime.of(9, 0))
        bars += barJson(sym, day, LocalTime.of(16, 30))
      }
      // weekend noise
      bars += barJson(sym, WeekendDay, LocalTime.of(10, 0))
      // early-close day: 09:30-12:55 ET (42 bars)
      rthSlots(EarlyCloseDay, LocalTime.of(13, 0)).foreach(t => bars += barJson(sym, EarlyCloseDay, t))
      // one unparseable timestamp (must be dropped by clean)
      bars += barJson(sym, FullDays.head, LocalTime.of(12, 0), badTs = true)

      val payload =
        s"""{
           |  "symbol": "$sym",
           |  "timeframe": "5Min",
           |  "source": "alpaca",
           |  "feed": "iex",
           |  "start_utc": "2025-10-31T00:00:00+00:00",
           |  "end_utc": "2025-11-30T00:00:00+00:00",
           |  "bars": [
           |${bars.mkString(",\n")}
           |  ]
           |}""".stripMargin
      Files.writeString(dir.resolve(s"${sym}_intraday_5min.json"), payload)
    }
    dir
  }
}
