"""Property tests for the round-11 operators: the perceptual-hash tier
(resize/dhash/phash invariants vs independent NumPy references), the
band-pair machinery vs a brute-force pair oracle, and the bucketized
z-score's bit-equality with the coarse form over randomized event
streams — the same Spark-vs-independent-reference discipline as
test_properties.py."""

from __future__ import annotations

import datetime

import numpy as np
from hypothesis import given, settings, strategies as st

from caffeonspark_spark.multimodal.imagehash import (
    dhash_bands,
    phash_bands,
    resize_area,
    to_gray,
)

_DIM = st.integers(min_value=9, max_value=40)


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**32 - 1), _DIM, _DIM)
def test_resize_area_matches_block_mean_reference(seed, h, w):
    """resize_area equals an independent per-box double loop (floor of the
    box mean over the rounded float-boundary partition), covers the full
    input grid, and preserves constant images exactly."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    oh, ow = 8, 9
    got = resize_area(img, oh, ow)
    ys = (np.arange(oh + 1) * h / oh).round().astype(int)
    xs = (np.arange(ow + 1) * w / ow).round().astype(int)
    ys[-1], xs[-1] = h, w
    for i in range(oh):
        for j in range(ow):
            box = img[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].astype(np.float64)
            assert got[i, j] == int(np.clip(box.mean(), 0, 255)), (i, j)
    const = np.full((h, w), int(rng.integers(0, 256)), np.uint8)
    assert (resize_area(const, oh, ow) == const[0, 0]).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_dhash_monotone_transform_invariance(seed):
    """dHash depends only on the ORDER of adjacent pixels, so any strictly
    increasing pixel transform leaves the hash bit-identical — the formal
    version of 'robust to contrast/gamma adjustment'."""
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 256, (8, 9), dtype=np.uint8)
    # strictly increasing random LUT (int64 — the hash only compares)
    lut = np.cumsum(rng.integers(1, 5, 256)).astype(np.int64)
    assert dhash_bands(g) == dhash_bands(lut[g])


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(-40, 40))
def test_phash_dc_offset_invariance(seed, off):
    """Adding a constant (clamped away from saturation) moves only the DC
    coefficient, which the median excludes — pHash must not change."""
    rng = np.random.default_rng(seed)
    g = rng.integers(60, 180, (32, 32), dtype=np.uint8)
    lifted = (g.astype(np.int64) + off).clip(0, 255).astype(np.uint8)
    assert phash_bands(g) == phash_bands(lifted)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 0xFFFF),
            st.integers(0, 0xFFFF),
            st.integers(0, 0xFFFF),
            st.integers(0, 0xFFFF),
        ),
        min_size=2,
        max_size=10,
        unique=True,
    ),
    st.integers(0, 12),
)
def test_band_pairs_match_bruteforce(spark, hashes, max_h):
    """near_dup_band_pairs (cap disabled) equals the brute-force all-pairs
    oracle: every pair that shares ≥1 band AND has Hamming ≤ max_h, with
    the exact Hamming value."""
    from caffeonspark_spark.multimodal.imagehash import near_dup_band_pairs

    rows = [(i, *h) for i, h in enumerate(hashes)]
    df = spark.createDataFrame(rows, "id long, b0 long, b1 long, b2 long, b3 long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in near_dup_band_pairs(
            df, max_hamming=max_h, max_band_df=len(rows)
        ).collect()
    }
    want = {}
    for i, a in enumerate(hashes):
        for j in range(i + 1, len(hashes)):
            b = hashes[j]
            if not any(a[k] == b[k] for k in range(4)):
                continue
            d = sum(bin(a[k] ^ b[k]).count("1") for k in range(4))
            if d <= max_h:
                want[(i, j)] = d
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5000),  # minutes offset over ~3.5 days
            st.integers(0, 1),  # event type choice
            st.integers(-100, 100),  # value
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(3, 6),
)
def test_zscore_bucketized_bit_equal_randomized(spark, evs, n):
    """The calendar-bucketized z-score emits EXACTLY the coarse form's
    rows on arbitrary event streams (random bucket occupancy, duplicate
    timestamps, frames spanning many sparse buckets) — for day AND hour
    granularity."""
    from caffeonspark_spark.operators.temporal import (
        rolling_zscore_anomaly,
        rolling_zscore_anomaly_bucketized,
    )

    base = datetime.datetime(2024, 3, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=m), 1, f"t{ty}", float(v))
        for i, (m, ty, v) in enumerate(evs)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double",
    )
    coarse = sorted(
        map(tuple, rolling_zscore_anomaly(ev, n=n, threshold=1.0).collect())
    )
    for unit in ("day", "hour"):
        fine = sorted(
            map(
                tuple,
                rolling_zscore_anomaly_bucketized(
                    ev, n=n, threshold=1.0, bucket=unit
                ).collect(),
            )
        )
        assert fine == coarse, unit


def test_zscore_out_of_range_value_raises(spark):
    """|value| >= 1e12 must RAISE (both forms), never silently NULL the
    row out of the anomaly set — the r12 guard on the decimal(18,6)
    overflow documented since r10. In-range data is bit-identical to the
    unguarded form (covered by the oracle gates)."""
    import datetime

    import pytest
    from caffeonspark_spark.operators.temporal import (
        rolling_zscore_anomaly,
        rolling_zscore_anomaly_bucketized,
    )

    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i), "a",
         float(i) if i != 30 else 1.0e12)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string, value double"
    )
    for fn in (rolling_zscore_anomaly, rolling_zscore_anomaly_bucketized):
        with pytest.raises(Exception, match="1e12|pre-scale"):
            fn(df).collect()


def test_zscore_nonfinite_value_raises_with_accurate_message(spark):
    """NaN/Infinity sentinels also decimal-cast to NULL, so they raise
    too — but with their OWN message: the overflow hint ('pre-scale the
    metric') cannot repair a non-finite value, and a monitor's crash line
    must name the actual defect (r12 review finding)."""
    import datetime

    import pytest
    from caffeonspark_spark.operators.temporal import (
        rolling_zscore_anomaly,
        rolling_zscore_anomaly_bucketized,
    )

    for bad in (float("nan"), float("inf"), float("-inf")):
        rows = [
            (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i),
             "a", float(i) if i != 30 else bad)
            for i in range(40)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, event_type string, value double",
        )
        for fn in (rolling_zscore_anomaly, rolling_zscore_anomaly_bucketized):
            with pytest.raises(Exception, match="non-finite"):
                fn(df).collect()


def test_zscore_n1_rejected_up_front(spark):
    """n=1 is degenerate for a SAMPLE-stddev z-score (divides by n-1):
    both forms must reject it with a clear ValueError at plan-build time
    — the r12 bounded-horizon rewrite would otherwise crash deep inside
    Catalyst with an invalid (1, 0) frame, and the coarse form with a
    runtime DIVIDE_BY_ZERO."""
    import datetime

    import pytest
    from caffeonspark_spark.operators.temporal import (
        rolling_zscore_anomaly,
        rolling_zscore_anomaly_bucketized,
    )

    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i), "a", float(i))
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string, value double"
    )
    for fn in (rolling_zscore_anomaly, rolling_zscore_anomaly_bucketized):
        with pytest.raises(ValueError, match="n >= 2"):
            fn(df, n=1)
    # n=2, the smallest legal window, runs in both forms and stays
    # bit-equal (same oracle contract as the default n)
    a = sorted(map(tuple, rolling_zscore_anomaly(df, n=2).collect()))
    b = sorted(map(tuple, rolling_zscore_anomaly_bucketized(df, n=2).collect()))
    assert a == b
