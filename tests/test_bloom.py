import hashlib

from tric_spark.operators import sketches

N_BITS, K, SEED = 256, 4, 7
INSERTED = [f"tok{i}" for i in range(40)]
PROBES = INSERTED[:10] + [f"other{i}" for i in range(60)]


def _bits(token):
    return {
        int(
            hashlib.md5(f"bloom:{SEED}:{i}:{token}".encode()).hexdigest()[:12], 16
        )
        % N_BITS
        for i in range(K)
    }


def _tokens(spark, toks):
    return spark.createDataFrame([(t,) for t in toks], "token string")


def test_bloom_matches_reference_bits_and_has_no_false_negatives(spark):
    bloom = sketches.bloom_build(_tokens(spark, INSERTED), N_BITS, K, SEED)
    got_bits = {r.bit for r in bloom.collect()}
    want_bits = set().union(*(_bits(t) for t in INSERTED))
    assert got_bits == want_bits

    hits = {
        r.token: r.hit
        for r in sketches.bloom_probe(
            _tokens(spark, PROBES), bloom, N_BITS, K, SEED
        ).collect()
    }
    assert len(hits) == len(set(PROBES))
    # no false negatives, ever
    assert all(hits[t] for t in INSERTED[:10])
    # every probe answers exactly what the reference bit sets say
    want = {t: _bits(t) <= want_bits for t in set(PROBES)}
    assert hits == want
    # the tiny filter is deliberately saturated enough to exhibit at least
    # one false positive AND at least one definite miss, so both branches
    # of the probe are exercised
    fp = [t for t in want if t not in INSERTED and want[t]]
    miss = [t for t in want if not want[t]]
    assert fp and miss


def test_bloom_build_is_bounded(spark):
    bloom = sketches.bloom_build(_tokens(spark, INSERTED * 50), N_BITS, K, SEED)
    assert bloom.count() <= N_BITS
