"""Cron-expression scheduling (diskv AutoMergeCronExpr parity)."""

import datetime as dt

import pytest

from coltt_tpu.utils.cron import CronError, CronSchedule


def test_parse_basic_fields():
    c = CronSchedule("*/15 3 1,15 jan-mar sun")
    assert c.minutes == frozenset({0, 15, 30, 45})
    assert c.hours == frozenset({3})
    assert c.doms == frozenset({1, 15})
    assert c.months == frozenset({1, 2, 3})
    assert c.dows == frozenset({0})


def test_next_after_every_five_minutes():
    c = CronSchedule("*/5 * * * *")
    now = dt.datetime(2026, 8, 21, 12, 3, 20)
    assert c.next_after(now) == dt.datetime(2026, 8, 21, 12, 5)
    assert c.next_after(dt.datetime(2026, 8, 21, 12, 5)) == \
        dt.datetime(2026, 8, 21, 12, 10)


def test_next_after_daily_and_dow():
    c = CronSchedule("30 2 * * mon")
    # 2026-08-21 is a Friday -> next Monday is 08-24
    assert c.next_after(dt.datetime(2026, 8, 21, 12, 0)) == \
        dt.datetime(2026, 8, 24, 2, 30)


def test_dom_dow_union():
    # Vixie semantics: both restricted -> union
    c = CronSchedule("0 0 13 * fri")
    nxt = c.next_after(dt.datetime(2026, 8, 1, 0, 0))
    # Aug 7 2026 is the first Friday; union fires then, not Aug 13
    assert nxt == dt.datetime(2026, 8, 7, 0, 0)


def test_sunday_as_seven():
    assert CronSchedule("0 0 * * 7").dows == frozenset({0})


def test_rejects_bad_exprs():
    for expr in ("* * * *", "61 * * * *", "*/0 * * * *", "5-1 * * * *",
                 "a * * * *"):
        with pytest.raises(CronError):
            CronSchedule(expr)


def test_kv_auto_merge_cron_wiring(tmp_path):
    """A cron spec starts the merger thread and a bad spec fails at open."""
    from coltt_tpu.storage.kv import KV

    kv = KV(str(tmp_path / "db"), auto_merge_cron="*/5 * * * *")
    assert kv._merger is not None and kv._merger.is_alive()
    assert kv._merge_cron is not None
    kv.close()

    with pytest.raises(CronError):
        KV(str(tmp_path / "db2"), auto_merge_cron="not a cron")
    # the failed open must not leave the dir locked
    kv2 = KV(str(tmp_path / "db2"))
    kv2.close()
