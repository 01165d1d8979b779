"""Test configuration.

Tests run on CPU with a virtual 8-device platform so sharding tests work
without TPU hardware (SURVEY.md §4: fake-mesh CPU testing). Must be set
before jax imports anything device-related.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the TPU tunnel
# (axon), which tests must not grab. Override with STPU_TEST_PLATFORM to
# run the suite on real hardware.
os.environ["JAX_PLATFORMS"] = os.environ.get("STPU_TEST_PLATFORM", "cpu")
# persistent compilation cache: repeated suite runs skip recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import subprocess  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data/MiddEval3"

# build the native IO runtime once so tests/test_native_io.py runs in CI
# instead of skipping (VERDICT round-1 weak item 6)
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
if not os.path.isfile(os.path.join(_NATIVE_DIR, "libstereo_io.so")):
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=False,
                       capture_output=True, timeout=120)
    except Exception:
        pass  # tests skip gracefully when no toolchain is present


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def middeval_root():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("MiddEval3 data not available")
    return REFERENCE_DATA


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running (oracle comparisons, batch-pipeline compiles, "
        "multihost subprocesses); skipped by default — set STPU_FULL_TESTS=1 "
        "for the full tier")


def pytest_collection_modifyitems(config, items):
    """Two test tiers (VERDICT r3 item 9): the default run is the quick
    tier (<= ~4 min on this 2-CPU host; live gates and exactness checks
    all included); STPU_FULL_TESTS=1 adds the slow oracle/pipeline-scale
    comparisons. CI / the driver run the quick tier; run the full tier
    after touching the perceptual, batch-pipeline, or multihost code."""
    if os.environ.get("STPU_FULL_TESTS"):
        return
    skip = pytest.mark.skip(reason="slow tier: set STPU_FULL_TESTS=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def warn_if_stale_baseline(report: dict, name: str) -> None:
    """Stale-artifact guard (VERDICT r2 item 4, hardened per r3 item 5):
    a recorded baselines/*.json whose generating hash differs from HEAD
    is a FAILURE when any generating code (the package or tools/) changed
    between the two revisions — warnings don't regenerate artifacts.
    Baselines-only commits after a refresh keep stamps valid (no
    generating code in the diff). Unknown/missing hashes stay warnings
    (e.g. a rebased history where the recorded hash no longer resolves)."""
    import warnings

    recorded = (report.get("_meta") or {}).get("git") or report.get("git")
    repo = os.path.join(os.path.dirname(__file__), "..")
    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=repo,
            capture_output=True, text=True).stdout.strip()
    except OSError:
        return
    if recorded is None:
        warnings.warn(f"{name}: no generating git hash recorded "
                      "(regenerate with the current tools)")
        return
    if not head or recorded == head:
        return
    # scope: the package + native runtime + THE artifact's own recorder
    # tool(s) — an edit to one recorder must not re-stale every other
    # artifact, and the refresh driver / diag_* scripts never influence
    # artifact content at all
    generators = {
        "MULTIHOST.json": ["tools/multihost_bench.py"],
        "SCALING.json": ["tools/scaling_bench.py"],
        "full_eval.json": ["tools/full_eval.py",
                           "tools/reference_baseline.py"],
        "perceptual_parity.json": ["tools/perceptual_parity.py",
                                   "tools/perceptual_scale.py"],
        "uncalibrated_eval.json": ["tools/uncalibrated_eval.py"],
        "config4_fullres.json": ["tools/config4_fullres.py"],
        "pose_profile.json": ["tools/profile_pose.py"],
        "pose_profile_batch.json": ["tools/profile_pose.py"],
    }
    scope = (["stereo_reconstruction_tpu", "native"]
             + generators.get(os.path.basename(name), ["tools"]))
    diff = subprocess.run(
        ["git", "diff", "--name-only", f"{recorded}..HEAD", "--"] + scope,
        cwd=repo, capture_output=True, text=True)
    if diff.returncode != 0:
        warnings.warn(f"{name}: generated at {recorded} which HEAD's "
                      "history cannot resolve — regenerate "
                      "(tools/refresh_all.py)")
        return
    changed = [ln for ln in diff.stdout.splitlines() if ln.strip()]
    if changed:
        pytest.fail(
            f"{name}: generated at {recorded} but generating code changed "
            f"since ({len(changed)} files, e.g. {changed[:3]}) — rerun "
            "tools/refresh_all.py and commit the regenerated artifacts")
