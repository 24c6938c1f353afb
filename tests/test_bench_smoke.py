"""The driver contract: bench.py must emit one parseable JSON line."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_json_line():
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        GRM_PLATFORM="cpu",
        BENCH_GENOMES="32",
        BENCH_KMERS="100000",
        BENCH_FOLDS="2",
        BENCH_MAX_RULES="2",
        BENCH_INGEST="0",
        BENCH_READS="0",
        BENCH_DEVICE_INGEST="0",  # device-scale sorts are not a CPU smoke
        BENCH_CART="0",
        BENCH_LARGEST_GENOMES="48",   # largest-dataset row at smoke scale
        BENCH_LARGEST_KMERS="120000",
        BENCH_LARGEST_RUNS="1",
        BENCH_RUNS="2",
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=500, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["metric"] == "scm_learn_e2e_wall_clock_median_dataset"
    assert payload["unit"] == "s"
    assert payload["value"] > 0
    assert payload["vs_baseline"] > 0
