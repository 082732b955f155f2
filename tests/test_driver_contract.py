"""Driver-contract tests run in FRESH subprocesses, without conftest's env.

Round-1 lesson (VERDICT.md weak #8): tests that exercised
`dryrun_multichip` under conftest's forced-CPU environment passed while
the driver's own invocation failed on import-time backend init. These
tests reproduce the driver's environment exactly: a clean subprocess,
no XLA_FLAGS, no JAX_PLATFORMS override, cwd at the repo root.
"""

import json
import os
import subprocess
import sys
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return env


@pytest.mark.slow
def test_dryrun_multichip_fresh_subprocess():
    """The driver's exact call: python -c 'from __graft_entry__ import ...'."""
    code = (
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                       env=_clean_env(), capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "dryrun_multichip(8): OK" in r.stdout


def test_package_import_does_not_touch_backend():
    """Importing latentaugment_tpu must not initialize any JAX backend, so a
    later jax.config.update('jax_platforms', ...) still takes effect."""
    code = (
        "import latentaugment_tpu\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert jax.default_backend() == 'cpu'\n"
        "print('OK')\n"
    )
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                       env=_clean_env(), capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "OK" in r.stdout


@pytest.mark.slow
def test_bench_json_contract_fresh_subprocess():
    """bench.py stdout must be only parseable result JSON lines in the
    driver's environment (CPU fallback path here): one or more
    provisional lines (best-so-far, printed as chains complete — a
    driver kill mid-protocol still scrapes a number, round-4 VERDICT
    weak #1) and the FINAL agreed line last, so a last-JSON-line
    scraper reads the final record."""
    env = _clean_env()
    # Force CPU fallback so the test doesn't burn a 300-500 s TPU compile;
    # bench.py itself handles platform selection when run by the driver.
    env["LATAUG_BENCH_FORCE_CPU"] = "1"
    r = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert 2 <= len(lines) <= 4, f"stdout lines: {lines}"
    recs = [json.loads(ln) for ln in lines]  # every line must parse
    for rec in recs[:-1]:
        assert rec["provisional"] is True and rec["value"] > 0
    rec = recs[-1]
    assert "provisional" not in rec  # the scraped (last) line is final
    for key in ("metric", "value", "unit", "vs_baseline", "batch",
                "oom_fallback"):
        assert key in rec, f"missing key {key!r} in {rec}"
    assert rec["value"] > 0
