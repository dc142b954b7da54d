package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Cron semantics mirroring the reference's CronRuleTest
 * (reference: tests/CronRuleTest.php:106-203): schedule advance,
 * aliases, field forms, dom/dow OR rule. */
class ScheduleSpec extends AnyFunSuite {

  test("field forms: star, step, range, list, range-with-step") {
    assert(Schedule.parseField("*", 0, 59)._1.size == 60)
    assert(Schedule.parseField("*/15", 0, 59)._1 == Set(0, 15, 30, 45))
    assert(Schedule.parseField("9-17", 0, 23)._1 == (9 to 17).toSet)
    assert(Schedule.parseField("1,3,5", 0, 7)._1 == Set(1, 3, 5))
    assert(Schedule.parseField("10-20/5", 0, 59)._1 == Set(10, 15, 20))
  }

  test("dow 7 normalises to Sunday=0") {
    val c = Schedule.parse("0 0 * * 7")
    assert(c.dow == Set(0))
  }

  test("aliases expand") {
    assert(Schedule.parse("@hourly").minutes == Set(0))
    assert(Schedule.parse("@daily").hours == Set(0))
    assert(Schedule.parse("@monthly").dom == Set(1))
  }

  test("nextAfter advances to the next matching minute") {
    val c = Schedule.parse("*/15 * * * *")
    val got = Schedule.nextAfter(c, Timestamp.valueOf("2024-01-01 10:07:30"))
    assert(got == Timestamp.valueOf("2024-01-01 10:15:00"))
  }

  test("nextAfter strictly after an exact match") {
    val c = Schedule.parse("0 * * * *")
    val got = Schedule.nextAfter(c, Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(got == Timestamp.valueOf("2024-01-01 11:00:00"))
  }

  test("impossible schedules raise instead of returning a wrong timestamp") {
    val c = Schedule.parse("0 0 31 2 *") // Feb 31 never exists
    intercept[IllegalArgumentException] {
      Schedule.nextAfter(c, Timestamp.valueOf("2024-01-01 00:00:00"))
    }
  }

  test("dom/dow are ORed when both restricted (standard cron)") {
    // fires on the 15th OR on Mondays
    val c = Schedule.parse("0 0 15 * 1")
    // 2024-01-08 is a Monday, not the 15th
    val mon = Schedule.nextAfter(c, Timestamp.valueOf("2024-01-07 23:59:00"))
    assert(mon == Timestamp.valueOf("2024-01-08 00:00:00"))
    // 2024-01-15 is a Monday too; from the 9th the next is the 15th (dom)
    val dom = Schedule.nextAfter(c, Timestamp.valueOf("2024-01-09 00:00:00"))
    assert(dom == Timestamp.valueOf("2024-01-15 00:00:00"))
  }

  test("weekday-restricted schedule skips weekends (AND when dom is star)") {
    val c = Schedule.parse("0 9 * * 1-5")
    // Friday 2024-01-05 09:00 → next is Monday 2024-01-08 09:00
    val got = Schedule.nextAfter(c, Timestamp.valueOf("2024-01-05 09:00:00"))
    assert(got == Timestamp.valueOf("2024-01-08 09:00:00"))
  }

  test("property: nextAfter agrees with a minute-scan for random crons and instants") {
    // the driver-side scheduler (nextAfter, used by live ticks) and a
    // brute-force minute scan of `matches` must never disagree — this
    // is the same invariant that keeps the batch grid face and the
    // streaming catch-up face in lockstep
    val rnd = new scala.util.Random(7)
    // generate each form directly inside the field's [lo, hi] domain so
    // star, step, RANGE and list parsing are all genuinely exercised
    def pick(lo: Int, hi: Int): String = rnd.nextInt(4) match {
      case 0 => "*"
      case 1 => s"*/${1 + rnd.nextInt(20)}"
      case 2 =>
        val a = lo + rnd.nextInt(hi - lo)
        val b = a + 1 + rnd.nextInt(hi - a)
        s"$a-$b"
      case _ =>
        Seq.fill(1 + rnd.nextInt(3))(lo + rnd.nextInt(hi - lo + 1))
          .distinct.sorted.mkString(",")
    }
    for (_ <- 1 to 60) {
      val expr = s"${pick(0, 59)} ${pick(0, 23)} * ${pick(1, 12)} *"
      val cron = Schedule.parse(expr)
      val start = Timestamp.valueOf(
        s"2024-0${1 + rnd.nextInt(9)}-${10 + rnd.nextInt(18)} " +
          f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:30")
      val got = Schedule.nextAfter(cron, start)
      // brute-force: walk minutes until the first match strictly after
      var t = start.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDateTime
        .withSecond(0).withNano(0).plusMinutes(1)
      var guard = 0
      def ok(x: java.time.LocalDateTime): Boolean =
        cron.minutes.contains(x.getMinute) && cron.hours.contains(x.getHour) &&
          cron.months.contains(x.getMonthValue) && cron.dom.contains(x.getDayOfMonth) &&
          cron.dow.contains(x.getDayOfWeek.getValue % 7)
      while (!ok(t) && guard < 600000) { t = t.plusMinutes(1); guard += 1 }
      val expect = Timestamp.from(t.toInstant(java.time.ZoneOffset.UTC))
      assert(got == expect, s"cron '$expr' from $start: got $got, expect $expect")
    }
  }
}
