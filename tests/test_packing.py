"""Sequence packing: python replay of the md5-ordered stream layout,
span/offset invariants, NULL filtering, and per-group independence."""

import hashlib

import pytest

from tric_spark.operators.packing import pack_sequences, packing_stats


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def _py_pack(rows, capacity):
    by_grp = {}
    for doc_id, text, grp in rows:
        if text is None:
            continue
        n = len(text.split(" "))
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        by_grp.setdefault(grp, []).append((h, doc_id, n))
    out = {}
    for grp, items in by_grp.items():
        off = 0
        for h, doc_id, n in sorted(items):
            out[doc_id] = (
                grp, n, off, off // capacity, (off + n - 1) // capacity
            )
            off += n
    return out


ROWS = [
    (1, "a b c d e", "h1"),
    (2, "x y", "h1"),
    (3, "one two three four five six seven", "h1"),
    (4, "lone", "h2"),
    (5, None, "h1"),
    (6, "p q r s t u v w x y z", "h2"),
]


def test_pack_matches_python_replay(spark):
    got = {
        r.doc_id: (r.grp, r.n_tokens, r.start_off, r.bin_start, r.bin_end)
        for r in pack_sequences(_docs(spark, ROWS), capacity=4).collect()
    }
    assert got == _py_pack(ROWS, capacity=4)
    assert 5 not in got  # NULL text filtered


def test_pack_stream_is_contiguous_per_group(spark):
    packed = pack_sequences(_docs(spark, ROWS), capacity=4).collect()
    for grp in {"h1", "h2"}:
        rows = sorted(
            (r for r in packed if r.grp == grp), key=lambda r: r.start_off
        )
        off = 0
        for r in rows:
            assert r.start_off == off
            assert r.bin_start == off // 4
            assert r.bin_end == (off + r.n_tokens - 1) // 4
            off += r.n_tokens


def test_pack_doc_longer_than_capacity_spans(spark):
    rows = [(1, " ".join(["t"] * 10), "g")]
    (r,) = pack_sequences(_docs(spark, rows), capacity=3).collect()
    assert r.bin_start == 0 and r.bin_end == 3  # 10 tokens over cap 3


def test_packing_stats_fill_ratio(spark):
    packed = pack_sequences(_docs(spark, ROWS), capacity=4)
    stats = {r.grp: r for r in packing_stats(packed, capacity=4).collect()}
    # h1: 5+2+7=14 tokens -> bins 0..3 (4 bins), fill 14/16
    assert stats["h1"].n_tokens == 14
    assert stats["h1"].n_bins == 4
    assert stats["h1"].fill_ratio == pytest.approx(14 / 16)
    # h2: 1+11=12 tokens -> 3 bins, fill 1.0
    assert stats["h2"].fill_ratio == pytest.approx(1.0)


def test_pack_capacity_guard(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, ROWS), capacity=0)
