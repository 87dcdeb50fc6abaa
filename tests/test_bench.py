"""bench.py harness smoke tests (CPU, tiny grid).

Round 2's recorded benchmark lost 14x to a harness bug (the timed
section silently included a second program's compilation), so the
harness itself is under test: the JSON contract, the one-compiled-
program structure, and the DEM suite.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(*args, timeout=600):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--platform", "cpu",
         *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line), out.stderr


@pytest.mark.slow
def test_freezing_json_contract():
    rec, err = run_bench("--grid-nodes", "8", "--steps", "5",
                         "--warm-steps", "5", "--dtype", "f64",
                         "--fused", "off")
    assert rec["unit"] == "cell*RHS-evals/s/chip"
    assert rec["value"] > 0
    assert rec["ms_per_attempt"] > 0
    # 8 != a named grid: metric generalizes
    assert rec["metric"].startswith("freezing_gradp_")
    # warmup and timing share ONE compiled program: the log announces a
    # per-call step count equal to the timed steps
    assert "(5 per solver call)" in err


@pytest.mark.slow
def test_dem_json_contract():
    rec, _ = run_bench("--suite", "dem", "--n-spheres", "8",
                       "--steps", "50")
    assert rec["metric"] == "dem_8_particle_rhs_evals_per_s"
    assert rec["unit"] == "particle*RHS-evals/s/chip"
    assert rec["value"] > 0
    assert rec["vs_baseline"] is None  # baseline defined only for n=200
