"""Gate rep-exclusion rules (bench._clean_reps, ADVICE r4 medium).

A rep is dropped from the headline median only on BOTH signals: >3x the
best rep AND direct in-rep compile evidence — a pure wall-clock ratio would
also discard genuine tunnel-window degradation (2.6x drift is documented),
silently overstating the gate metric.
"""
import importlib.util
import os
import sys

spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")
)
bench = importlib.util.module_from_spec(spec)
sys.modules["bench_mod"] = bench
spec.loader.exec_module(bench)


def test_single_rep_passes():
    assert bench._clean_reps([7.0]) == [7.0]


def test_compile_poisoned_rep_dropped():
    # 4x the best AND 30 s of measured in-rep compiles: measures the compiler
    assert bench._clean_reps([0.3, 1.3], [0.0, 30.0]) == [0.3]


def test_genuine_degradation_kept():
    # 4x the best but ZERO in-rep compiles: a real (degraded-window) rep —
    # it must count against the median (the old ratio-only rule dropped it)
    assert bench._clean_reps([0.3, 1.3], [0.0, 0.0]) == [0.3, 1.3]


def test_no_evidence_falls_back_to_ratio():
    # compile meter unavailable (None entries): ratio-only as before
    assert bench._clean_reps([0.3, 1.3], [None, None]) == [0.3]
    assert bench._clean_reps([0.3, 1.3]) == [0.3]


def test_partial_rep_without_snapshot_uses_ratio():
    # emergency path: the in-flight rep has no compile snapshot (shorter list)
    assert bench._clean_reps([0.3, 0.5, 2.0], [0.0, 0.0]) == [0.3, 0.5]


def test_below_ratio_always_kept():
    assert bench._clean_reps([0.3, 0.6, 0.8], [50.0, 50.0, 50.0]) == [0.3, 0.6, 0.8]


def test_evidence_bar_scales_with_rep_length():
    # a 4 s tiny rep poisoned by 2.3 s of compiles: the flat 5 s bar keeps
    # it, the rep-scaled bar (10% of wall, clamped [1, 5]) drops it
    assert bench._clean_reps([0.27, 1.62], [0.0, 2.3]) == [0.27, 1.62]
    assert bench._clean_reps([0.27, 1.62], [0.0, 2.3], audio_secs=4.0) == [0.27]
    # at the gate's 100 s reps the clamp restores the flat 5 s bar
    assert bench._clean_reps([0.35, 1.2], [0.0, 3.0], audio_secs=100.0) == [0.35, 1.2]
    assert bench._clean_reps([0.35, 1.2], [0.0, 30.0], audio_secs=100.0) == [0.35]
