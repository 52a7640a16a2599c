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


def test_multichip_dryrun_self_sufficient():
    """Regression for round-1 driver failure: dryrun_multichip must work
    from a process whose jax backend is ALREADY initialized with a
    single device and whose env does NOT force a virtual device count —
    exactly the driver's situation. The entry point must build its own
    forced virtual mesh (it relaunches in a subprocess).

    The hostile parent pins itself to CPU via jax.config (not just env:
    the session sitecustomize registers the axon TPU plugin in every
    python process and JAX_PLATFORMS=cpu alone does not stop
    jax.devices() from initializing it — during the 2026-08-17 tunnel
    outage that init retried forever and wedged the suite here for the
    full 900 s timeout). A CPU parent reproduces everything the
    regression is about: backend initialized, exactly one device, no
    forced virtual device count."""
    env = dict(os.environ)
    env.pop("NWS_TPU_PLATFORM", None)
    env["JAX_PLATFORMS"] = "cpu"  # avoid touching the real TPU in tests
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert jax.device_count() == 1, jax.devices()  # hostile parent\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n" % REPO
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
    assert "OK" in r.stdout
