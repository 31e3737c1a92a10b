package graft.graph

import java.time.LocalDateTime

/** 5-field cron trigger parsing/matching (`trigger: 1 * * * *` —
  * /root/reference/tests/configuration/test_config_editor.py:103,135).
  * Fields: minute hour day-of-month month day-of-week.
  * Supports `*`, lists, ranges and steps; enough for the vocabulary the
  * reference's graph.yml uses. The scheduler loop itself is driver-side
  * (out of t2 scope) — GraphRunner exposes `dueNodes` for it.
  */
final case class Cron(expr: String) {
  private val Array(mi, h, dom, mo, dow) =
    expr.trim.split("\\s+") match {
      case a if a.length == 5 => a
      case other => throw new IllegalArgumentException(
        s"cron '$expr' must have 5 fields, got ${other.length}")
    }

  private def matches(field: String, value: Int, min: Int, max: Int): Boolean =
    field.split(",").exists { part =>
      val (rangePart, step) = part.split("/") match {
        case Array(r) => (r, 1)
        case Array(r, s) => (r, s.toInt)
      }
      val (lo, hi) = rangePart match {
        case "*" => (min, max)
        case r if r.contains("-") =>
          val Array(a, b) = r.split("-"); (a.toInt, b.toInt)
        case v => (v.toInt, v.toInt)
      }
      value >= lo && value <= hi && (value - lo) % step == 0
    }

  def matches(t: LocalDateTime): Boolean =
    matches(mi, t.getMinute, 0, 59) &&
      matches(h, t.getHour, 0, 23) &&
      matches(dom, t.getDayOfMonth, 1, 31) &&
      matches(mo, t.getMonthValue, 1, 12) &&
      matches(dow, t.getDayOfWeek.getValue % 7, 0, 6) // 0 = Sunday

  /** Next firing strictly after `t` (minute resolution, bounded scan). */
  def nextAfter(t: LocalDateTime): LocalDateTime = {
    var c = t.withSecond(0).withNano(0).plusMinutes(1)
    val limit = t.plusYears(2)
    while (!matches(c)) {
      c = c.plusMinutes(1)
      if (c.isAfter(limit))
        throw new IllegalStateException(s"cron '$expr' never fires")
    }
    c
  }
}
