"""Benchmark sanity gates (VERDICT r3 item 7): the sampling throughput
number must fail loudly on degenerate output, not go green on garbage."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

REPO = Path(__file__).resolve().parent.parent


def test_sanity_gate_unit():
    from bench_sample import sanity_gate

    good = np.random.RandomState(0).randn(2, 8, 8, 3)
    sanity_gate(good)

    bad = good.copy()
    bad[0, 0, 0, 0] = np.nan
    with pytest.raises(AssertionError, match="non-finite"):
        sanity_gate(bad)
    with pytest.raises(AssertionError, match="constant"):
        sanity_gate(np.full((2, 8, 8, 3), 0.5))
    with pytest.raises(AssertionError, match="implausible"):
        sanity_gate(good * 1e9)


@pytest.mark.slow
def test_bench_sample_fails_on_nan_injection():
    """End-to-end: the bench process exits non-zero when the decode is
    poisoned, and zero when healthy (tiny CPU mode)."""
    env = {**os.environ, "SSDT_BENCH_SAMPLE_TINY": "1",
           "SSDT_BENCH_SAMPLE_METHODS": "ddim", "JAX_PLATFORMS": "cpu"}
    ok = subprocess.run([sys.executable, "bench_sample.py"], cwd=REPO,
                        env=env, capture_output=True, text=True, timeout=600)
    assert ok.returncode == 0, ok.stderr[-2000:]
    assert '"images/min"' in ok.stdout

    env["SSDT_BENCH_SAMPLE_INJECT_NAN"] = "1"
    poisoned = subprocess.run([sys.executable, "bench_sample.py"], cwd=REPO,
                              env=env, capture_output=True, text=True,
                              timeout=600)
    assert poisoned.returncode != 0
    assert "non-finite" in poisoned.stderr
