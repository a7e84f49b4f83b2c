"""Outage-proof backend init (VERDICT r3 item 1).

Round 3's failure: the axon TPU tunnel died mid-round and (a) `bench.py`
crashed at `jax.default_backend()` leaving the driver a null parse, (b) the
user-facing CLI hung >400 s because the axon plugin ignores JAX_PLATFORMS=cpu.
These tests pin the fix: bounded probes, env-var honoring, CPU fallback, and a
parseable bench headline no matter what the backend does.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

from mcport.utils.backend import ensure_backend, probe_backend

REPO = Path(__file__).resolve().parent.parent
SLEEPER = [sys.executable, "-c", "import time; time.sleep(60)"]


def _env(**extra):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra)
    return env


def test_probe_timeout_is_bounded():
    t0 = time.perf_counter()
    res = probe_backend(timeout=2.0, probe_cmd=SLEEPER)
    assert not res.ok
    assert "timed out" in res.detail
    assert time.perf_counter() - t0 < 30


def test_probe_reports_fast_failure():
    res = probe_backend(
        timeout=30, probe_cmd=[sys.executable, "-c", "raise SystemExit(3)"])
    assert not res.ok
    assert "rc=3" in res.detail


def test_probe_success_reports_backend():
    res = probe_backend(
        timeout=60, probe_cmd=[sys.executable, "-c", "print('cpu', end='')"])
    assert res.ok
    assert res.backend == "cpu"


def test_ensure_honors_jax_platforms_env(monkeypatch):
    # The documented failure: JAX_PLATFORMS=cpu was honored by conftest but NOT
    # by the CLI. ensure_backend must apply the config update, never probe.
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    t0 = time.perf_counter()
    assert ensure_backend(probe_cmd=SLEEPER) == "cpu"
    assert time.perf_counter() - t0 < 5


def test_ensure_falls_back_to_cpu_on_hung_probe(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("MCPORT_BACKEND_PROBE", "1")
    t0 = time.perf_counter()
    got = ensure_backend(timeout=2.0, retries=1, quiet=True, probe_cmd=SLEEPER)
    assert got == "cpu"
    assert time.perf_counter() - t0 < 30


def test_ensure_probe_skip_env(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("MCPORT_BACKEND_PROBE", "0")
    assert ensure_backend(probe_cmd=SLEEPER) == "default"


def test_cli_bounded_with_forced_cpu(fixtures_dir):
    """The round-3 empirical hang repro: `mcport stats` with JAX_PLATFORMS=cpu
    must complete (bounded), not hang past 400 s at backend init."""
    csv = str(fixtures_dir / "ETH_USD 7 Years Weekly.csv")
    proc = subprocess.run(
        [sys.executable, "-m", "mcport.cli", "stats", csv, "--period", "W"],
        env=_env(JAX_PLATFORMS="cpu"), capture_output=True, text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout)
    assert out["ann_factor"] == 52


def test_ensure_watchdog_default_falls_back_on_fast_failure():
    """Default (no env knobs) mode is the in-process watchdog: a backend init
    that RAISES quickly (relay down) must fall back to CPU in-process — no
    probe subprocess, no extra init on the healthy path."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'bogus');"
        "from mcport.utils.backend import ensure_backend; import sys;"
        "sys.stdout.write(ensure_backend(quiet=True));"
        "assert jax.default_backend() == 'cpu'"
    )
    env = _env(JAX_PLATFORMS="")
    env.pop("MCPORT_BACKEND_PROBE", None)
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert proc.stdout.strip() == "cpu"


def test_cli_watchdog_exits_actionably_on_hung_init(fixtures_dir):
    """Default-mode CLI against a backend init slower than the watchdog
    (1 ms simulates the hung tunnel): bounded exit(3) with a JAX_PLATFORMS
    hint, never an unbounded hang."""
    csv = str(fixtures_dir / "ETH_USD 7 Years Weekly.csv")
    env = _env(JAX_PLATFORMS="", MCPORT_BACKEND_TIMEOUT="0.001")
    env.pop("MCPORT_BACKEND_PROBE", None)
    proc = subprocess.run(
        [sys.executable, "-m", "mcport.cli", "stats", csv, "--period", "W"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 3, (proc.returncode, proc.stderr[-2000:])
    assert "JAX_PLATFORMS=cpu" in proc.stderr


def test_watchdog_fires_and_cancels():
    from mcport.utils.backend import init_watchdog

    fired = []
    cancel = init_watchdog(0.05, lambda: fired.append(1))
    time.sleep(0.5)
    assert fired == [1]
    fired.clear()
    cancel2 = init_watchdog(5.0, lambda: fired.append(2))
    cancel2()
    time.sleep(0.2)
    assert fired == []


def test_bench_headline_parseable_when_tpu_unreachable():
    """bench.py with backend init slower than the watchdog (simulating the
    round-3 hung tunnel): a structured backend_status error line is emitted,
    and the LAST line still parses as the headline metric (BENCH_r03
    regression — the driver must never see a traceback tail)."""
    # 1 ms watchdog: even a warm backend init (import jax alone is ~1 s)
    # cannot beat it, so the timeout path is deterministic.
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=_env(MCPORT_BACKEND_TIMEOUT="0.001", JAX_PLATFORMS=""),
        capture_output=True, text=True, timeout=300, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    parsed = [json.loads(l) for l in lines]
    assert parsed[-1]["metric"] == "gbm_path_steps_per_sec_per_chip"
    assert any(p["metric"] == "backend_status" and "tpu_unavailable" in p["unit"]
               for p in parsed)


def test_bench_headline_parseable_on_fast_init_failure():
    """The other round-3 failure mode: backend init RAISES quickly (tunnel
    relay down). Simulated with a bogus forced platform — bench must emit the
    structured error tail with rc=0 instead of a traceback."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=_env(JAX_PLATFORMS="nonexistent_platform"),
        capture_output=True, text=True, timeout=300, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    parsed = [json.loads(l) for l in lines]
    assert parsed[-1]["metric"] == "gbm_path_steps_per_sec_per_chip"
    assert parsed[-1]["value"] == 0.0
    assert "tpu_unavailable" in parsed[-1]["unit"]


_TPU_MAIN_DRIVER = """
import json
import sys
import time

sys.path.insert(0, {repo!r})
import bench

def fake_headline(mean, chol, on_tpu):
    {headline_body}

bench.headline = fake_headline
bench.fleet = lambda m, c: {fleet_body}
bench.configs = lambda m, c: None
bench._tpu_main(None, None)
"""


def _run_tpu_main(headline_body, fleet_body, **env):
    proc = subprocess.run(
        [sys.executable, "-c", _TPU_MAIN_DRIVER.format(
            repo=str(REPO), headline_body=headline_body,
            fleet_body=fleet_body)],
        env=_env(JAX_PLATFORMS="cpu", **env),
        capture_output=True, text=True, timeout=120, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    return [json.loads(l) for l in lines]


def test_bench_fleet_stall_flushes_held_headline():
    """Round-5 stall-proofing: a fleet stage that outlives MCPORT_FLEET_DEADLINE
    (simulating the observed 26-min mid-fleet tunnel freeze) must still end
    the stream with the PRE-MEASURED headline as the last JSON line, after a
    structured fleet_status error line, rc=0."""
    parsed = _run_tpu_main(
        "print(json.dumps({'metric': 'gbm_path_steps_per_sec_per_chip',"
        " 'value': 7.9e9, 'unit': 'fake', 'vs_baseline': 7.9}))",
        "time.sleep(60)",
        MCPORT_FLEET_DEADLINE="0.5",
    )
    assert parsed[-1]["metric"] == "gbm_path_steps_per_sec_per_chip"
    assert parsed[-1]["value"] == 7.9e9  # the held (pre-measured) line
    assert any(p["metric"] == "fleet_status" and "deadline" in p["unit"]
               for p in parsed)


def test_bench_headline_stall_emits_error_headline():
    """If the headline measure itself stalls past MCPORT_HEADLINE_TIMEOUT the
    process must exit 0 with a parseable zero-value headline, not hang."""
    parsed = _run_tpu_main(
        "time.sleep(60)",
        "None",
        MCPORT_HEADLINE_TIMEOUT="0.5",
    )
    assert parsed[-1]["metric"] == "gbm_path_steps_per_sec_per_chip"
    assert parsed[-1]["value"] == 0.0
    assert "tpu_stalled" in parsed[-1]["unit"]


def test_bench_tpu_main_normal_path_prints_headline_last():
    """Normal completion: stages run, timers cancel, held headline is flushed
    last (the driver's last-JSON-line contract)."""
    parsed = _run_tpu_main(
        "print(json.dumps({'metric': 'gbm_path_steps_per_sec_per_chip',"
        " 'value': 8.0e9, 'unit': 'fake', 'vs_baseline': 8.0}))",
        "print(json.dumps({'metric': 'fake_fleet_line', 'value': 1.0,"
        " 'unit': 'x', 'vs_baseline': None}))",
    )
    assert parsed[-1]["metric"] == "gbm_path_steps_per_sec_per_chip"
    assert parsed[-1]["value"] == 8.0e9
    assert parsed[0]["metric"] == "fake_fleet_line"
