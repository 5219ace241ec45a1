"""Unit pins for bench.py's measurement policy (no Spark session needed).

The N->4N scaling retry must fire exactly on the steal-contamination
signature (efficiency under the bar AND an inflated Amdahl serial
estimate) and never on a clean window — a genuine sub-0.8 result with a
clean ~2 s residue is reported as-is, so the retry cannot manufacture
efficiency. The numeric cases below are the two contaminated full-bench
runs observed in round 5 and the round-5 validated clean line.
"""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "bench_mod",
    os.path.join(os.path.dirname(__file__), os.pardir, "bench.py"),
)
bench_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench_mod)

N = 8_000_000


def _walls(tput_low, tput_high):
    return N / tput_low, N / tput_high


def test_retry_fires_on_observed_contaminated_runs():
    # round-5 session runs recorded at efficiency 0.738 / 0.761 with
    # serial_sec_est 3.73 / 2.97 — both steal artifacts by the signature
    for tput_low, tput_high in [(253_708.6, 749_074.4), (282_070.5, 858_847.9)]:
        wl, wh = _walls(tput_low, tput_high)
        assert bench_mod.scaling_retry_needed(wl, wh, 2, 8)


def test_no_retry_on_clean_validated_line():
    # round-5 validated clean line: 283.4k -> 932.8k, efficiency 0.823,
    # serial_sec_est 2.03
    wl, wh = _walls(283_400.0, 932_800.0)
    assert not bench_mod.scaling_retry_needed(wl, wh, 2, 8)


def test_no_retry_on_genuine_sub_bar_result():
    # a REAL efficiency shortfall shows the clean serial residue: walls
    # chosen so serial_est = 2.0 exactly while efficiency < 0.8
    wh = 6.0
    wl = 4 * wh - 3 * 2.0  # serial_est == 2.0, efficiency 0.75
    assert (wl / wh) / 4 < 0.80
    assert not bench_mod.scaling_retry_needed(wl, wh, 2, 8)


def test_retry_condition_is_conjunctive():
    # efficiency >= 0.8 never retries, however inflated the estimate looks
    wh = 10.0
    wl = 0.85 * 4 * wh
    assert bench_mod.scaling_retry_needed(wl, wh, 2, 8) is False
