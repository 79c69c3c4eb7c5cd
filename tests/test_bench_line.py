"""bench.py's printed result line: the driver parses the LAST 2000 chars
of stdout as JSON, so the one printed line must ALWAYS fit — the old
degrade ladder stopped at decisecond rounding and overflowed at 92 rows
(BENCH_r08 and BENCH_r11 both recorded parsed:null). These tests pin the
always-fits guarantee at sizes far past the declared surface."""

from __future__ import annotations

import importlib.util
import json
import os

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_HERE, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_result_line_fits_at_250_rows():
    bench = _bench()
    timings = {f"q_synthetic_query_name_{i:03d}": 1.234 + i * 0.017 for i in range(250)}
    line = bench._result_line(timings, 0.1)
    assert len(line) <= bench._LINE_BUDGET
    d = json.loads(line)
    assert d["value"] == round(sum(timings.values()), 2)
    assert d["sf"] == 0.1
    # the slowest rows survive truncation; the dropped count is honest
    assert "synthetic_query_name_249" in d["queries"]
    assert d["dropped"] + len(d["queries"]) == 250


def test_result_line_full_form_at_small_surface():
    bench = _bench()
    timings = {f"q_name_{i}": 0.51 for i in range(40)}
    line = bench._result_line(timings, 0.01)
    assert len(line) <= bench._LINE_BUDGET
    d = json.loads(line)
    assert d["metric"] == "headline_suite_wall_seconds"
    assert len(d["queries"]) == 40 and "dropped" not in d


def test_result_line_fits_even_at_pathological_sizes():
    bench = _bench()
    for n in (92, 120, 500, 2000):
        timings = {f"q_extremely_long_operator_name_{i:05d}": 123.456 for i in range(n)}
        line = bench._result_line(timings, 0.1)
        assert len(line) <= bench._LINE_BUDGET, n
        assert json.loads(line)["value"] == round(sum(timings.values()), 2)


def test_runs_wanted_noise_adaptive():
    """r16: the serialized-repeat count adapts to observed spread — the
    two BEST runs must corroborate within bench.NOISE_SPREAD or another
    run is taken, capped at bench.MAX_RUNS."""
    import bench

    # stable pair: stop at 2
    assert bench.runs_wanted([1.0, 1.1], 2) == 2
    # burst on one of the first two: take a third
    assert bench.runs_wanted([1.0, 5.0], 2) == 3
    # one-time first-run cost + two agreeing steady runs: stop at 3
    assert bench.runs_wanted([16.0, 2.65, 2.6], 3) == 3
    # never exceeds the cap even if the host never settles
    assert bench.runs_wanted([1.0, 5.0, 9.0, 13.0], 4) == 4
    # _EXTRA_RUN rows (want=3) with two agreeing best runs stop at 3
    assert bench.runs_wanted([2.0, 2.1, 7.0], 3) == 3
