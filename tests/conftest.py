"""Test configuration.

JAX tests run on a virtual 8-device CPU mesh so sharding logic is exercised
without TPU hardware; kernel unit tests compare against the numpy oracle.
"""
import os
import subprocess
import sys
from pathlib import Path

# Force CPU + 8 virtual devices BEFORE jax import (any test may import
# jax).  Hard-set, not setdefault: the session environment pins
# JAX_PLATFORMS to the TPU platform, and tests must run on the virtual
# CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
# The image's sitecustomize imports jax at interpreter start, so the env
# var alone is read too late; the config update below still wins as long
# as no backend has been initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compilation cache: jax-backend golden tests recompile the
# same per-bucket kernels every run (and _clear_jax_caches drops them
# between tests); reloading a serialized executable is ~100x faster than
# recompiling, which is what makes the full suite runnable as a whole.
_JAX_CACHE = Path(__file__).resolve().parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_JAX_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pytest  # noqa: E402

REF_BIN = REPO / "refbin" / "xevdb_app"
REF_BIN_MAIN = REPO / "refbin" / "xevd_app"
REF_LIB_MAIN = REPO / "refbuild" / "main" / "lib" / "libxevd.so"
FIXDIR = REPO / "tests" / "fixtures"


def have_ref() -> bool:
    return REF_BIN.exists()


def have_ref_main() -> bool:
    return REF_BIN_MAIN.exists()


def have_ref_lib() -> bool:
    return REF_LIB_MAIN.exists()


@pytest.fixture(scope="session")
def fixtures_dir():
    FIXDIR.mkdir(parents=True, exist_ok=True)
    return FIXDIR


@pytest.fixture(autouse=True)
def _clear_jax_caches():
    """XLA:CPU's in-process compiler aborts/segfaults after enough distinct
    compilations accumulate in one process (observed at the tail of the
    golden suite).  Dropping the executable cache between tests keeps the
    compiler's working set bounded; shapes shared across tests recompile,
    which is noise next to the decode time."""
    yield
    jax.clear_caches()


def make_stream(path, w, h, n, qp, seed, gop, density=0.5, profile=0,
                tools=None, bd=8):
    """Generate (cached) a test stream via tools/evc_enc."""
    if path.exists():
        return path
    sys.path.insert(0, str(REPO / "tools"))
    import evc_enc
    t = evc_enc.Tools(**{k: 1 for k in (tools or [])})
    data = evc_enc.encode_stream(w, h, n, qp, seed, gop, density,
                                 profile=profile, tools=t, bd=bd)
    path.write_bytes(data)
    return path


def ref_decode(stream_path, out_path, out_bd=10, main=False):
    """Decode with the reference binary; returns path to golden YUV."""
    if out_path.exists():
        return out_path
    binp = REF_BIN_MAIN if main else REF_BIN
    r = subprocess.run(
        [str(binp), "-i", str(stream_path), "-o", str(out_path),
         "--output-bit-depth", str(out_bd)],
        capture_output=True, text=True)
    assert r.returncode == 0, f"reference decoder failed: {r.stdout}\n{r.stderr}"
    return out_path
