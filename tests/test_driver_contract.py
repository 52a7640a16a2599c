"""Guards on the driver-facing contract files: bench.py must print one
valid JSON line; __graft_entry__ must compile single-chip and run a
full data-parallel training step on a virtual mesh."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_one_json_line():
    env = dict(os.environ, NWS_TPU_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] > 0


def test_graft_entry_and_multichip_dryrun():
    import jax

    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 64000)

    assert jax.device_count() >= 8
    g.dryrun_multichip(8)  # asserts finite loss internally
