import hashlib

import pytest

from tric_spark.operators.split import assign_split, split_key, split_summary
from tric_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def _brute_split(ids, fractions, seed=11):
    out = {}
    for i in ids:
        h = hashlib.md5(f"split:{seed}:{i}".encode()).hexdigest()
        u = int(h[:12], 16) / float(1 << 48)
        acc = 0.0
        label = list(fractions)[-1]
        for name, frac in list(fractions.items())[:-1]:
            acc += frac
            if u < acc:
                label = name
                break
        out[i] = label
    return out


def test_split_matches_reference_hash_and_is_stable(spark):
    docs = load_table(spark, SF, "documents")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {
        r.doc_id: r.split for r in assign_split(docs, fr).collect()
    }
    want = _brute_split([r.doc_id for r in docs.select("doc_id").collect()], fr)
    assert got == want
    # repartitioning must not move any document (the randomSplit trap)
    got32 = {
        r.doc_id: r.split
        for r in assign_split(docs.repartition(32), fr).collect()
    }
    assert got32 == got


def test_split_fractions_roughly_hold(spark):
    docs = load_table(spark, SF, "documents")
    sizes = {
        r.split: r.n_docs for r in split_summary(docs).collect()
    }
    assert sum(sizes.values()) == 500
    assert 400 <= sizes["train"] <= 490  # 0.9 of 500, binomial slack


def test_bad_fractions_rejected(spark):
    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError):
        assign_split(docs, {"a": 0.5, "b": 0.6})
