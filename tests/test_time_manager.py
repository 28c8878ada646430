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
