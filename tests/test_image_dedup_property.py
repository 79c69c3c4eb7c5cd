"""Randomized property check of the composed ``image_dedup`` map: for
arbitrary small hash tables (tiny band alphabet → forced exact groups,
band collisions, and cap saturation), the distributed exact→band→
components→map pipeline must equal an independent union-find evaluation
in plain Python — covering table shapes the fixed corpus never takes
(all-identical hashes, singleton survivors, cap-killed bands)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from caffeonspark_spark.multimodal.imagehash import image_dedup

MAX_BAND_DF = 2
MAX_HAMMING = 8


def _brute_map(rows: list[tuple[int, int, int, int, int]]) -> dict[int, int]:
    # stage 1: exact groups on the full band tuple
    rep_of_hash: dict[tuple, int] = {}
    for rid, *bs in rows:
        key = tuple(bs)
        rep_of_hash[key] = min(rep_of_hash.get(key, rid), rid)
    id_rep = {rid: rep_of_hash[tuple(bs)] for rid, *bs in rows}
    survivors = {rep: key for key, rep in rep_of_hash.items()}
    # stage 2: banded pairs over survivors with the per-(k, band) cap
    df: dict[tuple[int, int], int] = {}
    for key in survivors.values():
        for k, b in enumerate(key):
            df[(k, b)] = df.get((k, b), 0) + 1
    reps = sorted(survivors)
    parent = {r: r for r in reps}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(reps):
        for b in reps[i + 1 :]:
            ka, kb = survivors[a], survivors[b]
            if not any(
                ka[k] == kb[k] and df[(k, ka[k])] <= MAX_BAND_DF for k in range(4)
            ):
                continue
            ham = sum(bin(ka[k] ^ kb[k]).count("1") for k in range(4))
            if ham <= MAX_HAMMING:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    # stage 3: canonical keep = min rep in the component
    comp_min: dict[int, int] = {}
    for r in reps:
        root = find(r)
        comp_min[root] = min(comp_min.get(root, r), r)
    return {rid: comp_min[find(rep)] for rid, rep in id_rep.items()}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 7),  # band values from a tiny alphabet ->
            st.integers(0, 7),  # guaranteed collisions + cap saturation
            st.integers(0, 3),
            st.integers(0, 65535),  # one realistic 16-bit band
        ),
        min_size=1,
        max_size=10,
    )
)
def test_image_dedup_matches_union_find(spark, band_rows):
    rows = [(i, *bs) for i, bs in enumerate(band_rows)]
    df = spark.createDataFrame(rows, "id long, b0 long, b1 long, b2 long, b3 long")
    got = {
        r["id"]: r["keep_id"]
        for r in image_dedup(
            df, max_hamming=MAX_HAMMING, max_band_df=MAX_BAND_DF
        ).collect()
    }
    assert got == _brute_map(rows)
