"""End-to-end contract tests for bench.py — the driver's deliverable.

bench.py must print exactly ONE JSON line on stdout (CLAUDE.md) with a
positive steps/sec value whatever steps/chunk combination the env picks.
These run the real harness as a subprocess on CPU at a 16px smoke config
(seconds per run); the deliberately misaligned steps/chunk pair (12/5)
regression-tests the timed-window alignment: before align_steps, the
single-job path silently reported an unsynced rate and the batched path
crashed formatting a None steps_per_sec BEFORE the JSON line.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(tmp_path, config):
    env = dict(os.environ)
    env.update({
        "ASTT_PLATFORM": "cpu",
        "JAX_PLATFORMS": "cpu",
        "ASTT_BENCH_CONFIG": config,
        # 5 does not divide 12: align_steps must round the window up
        "ASTT_BENCH_STEPS": "12",
        "ASTT_BENCH_CHUNK": "5",
        # keep harness runs out of the committed baseline cache
        "ASTT_BENCH_BASELINE_CACHE": str(tmp_path / "cache.json"),
        "ASTT_BENCH_DEVICE_TIMEOUT": "120",
    })
    proc = subprocess.run([sys.executable, "bench.py"], cwd=ROOT,
                          capture_output=True, text=True, timeout=900,
                          env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {lines!r}"
    out = json.loads(lines[0])
    assert "aligned up to chunk size" in proc.stderr
    return out


def test_bench_single_job_json_contract(tmp_path):
    out = _run_bench(tmp_path, "smoke16")
    assert out["unit"] == "steps/sec"
    assert out["value"] > 0
    # the torch-CPU twin ran (16px, 3 steps) and produced a real ratio
    assert out["vs_baseline"] is not None and out["vs_baseline"] > 0
    assert (tmp_path / "cache.json").exists()


def test_bench_batched_json_contract(tmp_path):
    out = _run_bench(tmp_path, "smokebatch16")
    assert out["unit"] == "job-steps/sec"
    assert out["value"] > 0
