"""Blocked sorted key list (utils/sortedkeys.py — diskv btree role)."""

import random

import pytest

from coltt_tpu.utils import sortedkeys
from coltt_tpu.utils.sortedkeys import SortedKeys


def test_basic_order_and_membership():
    sk = SortedKeys([b"c", b"a", b"b"])
    assert list(sk) == [b"a", b"b", b"c"]
    assert list(reversed(sk)) == [b"c", b"b", b"a"]
    assert b"b" in sk and b"z" not in sk
    sk.add(b"z")
    sk.add(b"z")  # duplicate ignored
    assert len(sk) == 4 and list(sk)[-1] == b"z"
    sk.discard(b"a")
    sk.discard(b"nope")  # absent: no-op
    assert list(sk) == [b"b", b"c", b"z"]


def test_range_list_and_irange_bounds():
    sk = SortedKeys(b"%03d" % i for i in range(0, 100, 2))  # evens 0..98
    assert sk.range_list(b"010", b"020") == [b"%03d" % i for i in range(10, 21, 2)]
    # bounds are inclusive; odd (absent) bounds clamp correctly
    assert sk.range_list(b"011", b"019") == [b"012", b"014", b"016", b"018"]
    assert sk.range_list(None, b"004") == [b"000", b"002", b"004"]
    assert sk.range_list(b"096", None) == [b"096", b"098"]
    assert sk.range_list(b"200", None) == []
    assert list(sk.irange(b"011", b"019")) == [b"012", b"014", b"016", b"018"]
    assert list(sk.irange()) == list(sk)


def test_randomized_against_reference(monkeypatch):
    """Force tiny blocks so split/merge paths exercise constantly."""
    monkeypatch.setattr(sortedkeys, "BLOCK", 4)
    rnd = random.Random(7)
    sk = SortedKeys()
    ref = set()
    for step in range(4000):
        k = b"%05d" % rnd.randrange(500)
        if rnd.random() < 0.6:
            sk.add(k)
            ref.add(k)
        else:
            sk.discard(k)
            ref.discard(k)
        if step % 500 == 0:
            assert list(sk) == sorted(ref)
            assert len(sk) == len(ref)
            lo, hi = sorted(
                [b"%05d" % rnd.randrange(500), b"%05d" % rnd.randrange(500)]
            )
            want = sorted(x for x in ref if lo <= x <= hi)
            assert sk.range_list(lo, hi) == want
            assert list(sk.irange(lo, hi)) == want
    assert list(sk) == sorted(ref)
    assert list(reversed(sk)) == sorted(ref, reverse=True)


def test_empty():
    sk = SortedKeys()
    assert len(sk) == 0 and list(sk) == [] and list(reversed(sk)) == []
    assert sk.range_list(b"a", b"z") == []
    assert list(sk.irange(b"a", b"z")) == []
    sk.discard(b"a")
    sk.add(b"a")
    assert list(sk) == [b"a"]
