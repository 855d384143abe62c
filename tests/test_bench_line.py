"""bench.py result-line contract: the driver keeps only the last 2000
chars of output and json-parses them, so the one-line JSON must always
fit — with the headline metric intact and the SLOWEST queries kept.
No Spark needed: the fitting logic is a pure function.
"""

from __future__ import annotations

import importlib.util
import json
import sys

spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
sys.modules["bench"] = bench
spec.loader.exec_module(bench)


def _times(n: int) -> dict[str, float]:
    # realistic name lengths and a heavy-tailed time distribution
    return {
        f"operator_with_a_long_name_{i:03d}": 0.05 + (i % 7) + (7.0 if i % 29 == 0 else 0.0)
        for i in range(n)
    }


def test_line_fits_and_parses_at_full_query_count():
    line = bench.fit_result_line(_times(138), 0.1)
    assert len(line) <= 1800
    d = json.loads(line)
    assert d["metric"] == "total_declared_query_sec"
    assert d["queries_total"] == 138
    assert d["queries_omitted"] == 138 - len(d["queries"])
    # tail-buffer simulation: the full line survives a 2000-char tail
    assert json.loads(line[-2000:]) == d


def test_slowest_queries_survive_the_trim():
    times = _times(138)
    d = json.loads(bench.fit_result_line(times, 0.1))
    kept = set(d["queries"])
    dropped = set(times) - kept
    if dropped:
        assert max(times[k] for k in dropped) <= min(times[k] for k in kept)


def test_small_sets_are_untrimmed():
    d = json.loads(bench.fit_result_line({"q1": 1.234, "q2": 0.5}, 0.01))
    assert d["queries_omitted"] == 0
    assert d["queries"] == {"q1": 1.23, "q2": 0.5}
    assert d["value"] == 1.734


def test_fastest_mode_keeps_the_other_half():
    times = _times(138)
    line = bench.fit_result_line(times, 0.1, itemize="fastest")
    assert len(line) <= 1800
    d = json.loads(line)
    assert d["itemized"] == "fastest"
    kept = set(d["queries"])
    dropped = set(times) - kept
    if dropped:
        assert min(times[k] for k in dropped) >= max(times[k] for k in kept)
    # the two modes walk ONE total order from opposite ends, so their
    # kept sets are exact complements — zero wasted overlap until the
    # two prefixes together cover everything
    d_slow = json.loads(bench.fit_result_line(times, 0.1, itemize="slowest"))
    union = kept | set(d_slow["queries"])
    assert len(union) == min(len(times), len(kept) + len(d_slow["queries"]))


def test_two_rounds_cover_all_real_queries():
    # the r11 blind spot, closed: with the REAL declared query names
    # (and a realistic time distribution), slowest-itemized round N and
    # fastest-itemized round N+1 together record a driver timing for
    # every query
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    times = {
        n: 0.05 + (i % 7) * 0.31 + (5.0 if i % 29 == 0 else 0.0)
        for i, n in enumerate(names)
    }
    kept_s = set(json.loads(bench.fit_result_line(times, 0.1, itemize="slowest"))["queries"])
    kept_f = set(json.loads(bench.fit_result_line(times, 0.1, itemize="fastest"))["queries"])
    assert kept_s | kept_f == set(names)


def test_round_parity_itemize(tmp_path):
    assert bench.round_parity_itemize(str(tmp_path)) == "fastest"  # round 1
    (tmp_path / "BENCH_r11.json").write_text("{}")
    assert bench.round_parity_itemize(str(tmp_path)) == "slowest"  # round 12
    (tmp_path / "BENCH_r12.json").write_text("{}")
    assert bench.round_parity_itemize(str(tmp_path)) == "fastest"  # round 13


def test_calib_and_load_fields_fit_and_survive_trim():
    # r14: the calibration probe must appear in the line without
    # breaking the 1800-char cap or the two-round coverage guarantee
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    times = {
        n: 0.05 + (i % 7) * 0.31 + (5.0 if i % 29 == 0 else 0.0)
        for i, n in enumerate(names)
    }
    kept = set()
    for mode in ("slowest", "fastest"):
        line = bench.fit_result_line(times, 0.1, itemize=mode, calib=1.234, load=17.85)
        assert len(line) <= 1800
        d = json.loads(line[-2000:])
        assert d["calib"] == 1.23 and d["load"] == 17.8 or d["load"] == 17.9
        kept |= set(d["queries"])
    assert kept == set(names)  # complement coverage holds with the extra fields


def test_scaling_attestation_fields_fit_and_survive_trim():
    # r15 (VERDICT r14 #2): master / parallelism / compute-bound calibp
    # ride the line without breaking the cap or two-round coverage
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    times = {
        n: 0.05 + (i % 7) * 0.31 + (5.0 if i % 29 == 0 else 0.0)
        for i, n in enumerate(names)
    }
    extra = {"calibp": 0.31, "master": "local[32]", "parallelism": 32}
    kept = set()
    for mode in ("slowest", "fastest"):
        line = bench.fit_result_line(
            times, 0.1, itemize=mode, calib=1.234, load=17.85, extra=extra
        )
        assert len(line) <= 1800
        d = json.loads(line[-2000:])
        assert d["master"] == "local[32]"
        assert d["parallelism"] == 32
        assert d["calibp"] == 0.31
        kept |= set(d["queries"])
    assert kept == set(names)
