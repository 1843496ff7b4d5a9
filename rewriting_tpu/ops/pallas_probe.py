"""Runtime detection for compiled Pallas support.

Compiled Pallas kernels fault this image's experimental 'axon' TPU worker
(it restarts, taking every process's device with it), so the kernels in
pallas_upfirdn.py cannot simply be try/except-ed in process.  This probe
runs the REAL FIR kernels on small shapes in a SUBPROCESS with a timeout:
a crash, fault, or hang is contained, and the verdict is cached on disk
so the (potentially destructive) experiment happens at most once per
runtime.  (A trivial add-one kernel is NOT a sufficient probe: this
image's runtime runs toy bodies fine and faults only on the halo-DMA
kernels — measured 2026-08-16.)

Policy: the probe only ever runs when REWRITING_TPU_TRY_PALLAS=1 — on an
unknown runtime the default answer is False (use the XLA formulations,
which are exact).  Only POSITIVE verdicts are cached on disk: a failed
probe may just mean the parent process already held exclusive device
access (libtpu grants one process the TPU), a timeout, or other
transients, so it must not poison later runs.  The intended flow on a
standard runtime is one standalone run of
``REWRITING_TPU_TRY_PALLAS=1 python -m rewriting_tpu.ops.pallas_probe``
before starting work — the cached success then enables the kernels for
every later process with no probing.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_PROBE_SRC = r"""
import os, sys
sys.path.insert(0, os.environ["REWRITING_TPU_REPO"])
import numpy as np
import jax
import jax.numpy as jnp

# The probe must exercise the REAL kernels: this image's axon runtime
# compiles and runs trivial Pallas bodies fine but faults the worker on
# the halo-DMA FIR kernels (observed 2026-08-16: probe passed, first
# blur2d_pallas dispatch took the device down), so a toy kernel is a
# false positive.
from rewriting_tpu.ops.upfirdn2d import make_kernel, upfirdn2d
from rewriting_tpu.ops.pallas_upfirdn import blur2d_pallas, upsample2x_pallas

kern = np.asarray(make_kernel([1, 3, 3, 1]))
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(2, 33, 33, 128), jnp.float32)
want = upfirdn2d(x, jnp.asarray(kern) * 4.0, up=1, down=1, pad=(1, 1))
got = blur2d_pallas(x, kern * 4.0, (1, 1))
assert float(jnp.max(jnp.abs(got - want))) < 1e-4 * float(
    jnp.max(jnp.abs(want))), "blur kernel mismatch"

x2 = jnp.asarray(rng.randn(2, 16, 16, 128), jnp.float32)
want2 = upfirdn2d(x2, jnp.asarray(kern) * 4.0, up=2, down=1, pad=(2, 1))
got2 = upsample2x_pallas(x2, kern * 4.0, (2, 1))
assert float(jnp.max(jnp.abs(got2 - want2))) < 1e-4 * float(
    jnp.max(jnp.abs(want2))), "upsample kernel mismatch"
print("PALLAS_OK")
"""

_cached = None


def _cache_path() -> str:
    base = os.environ.get("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    return os.path.join(base, "pallas_probe.json")


def compiled_pallas_supported(timeout: float = 120.0) -> bool:
    """True iff a compiled Pallas kernel ran successfully on this runtime
    (probed in a subprocess, verdict cached). False unless
    REWRITING_TPU_TRY_PALLAS=1 authorized the probe at least once."""
    global _cached
    if _cached is not None:
        return _cached
    path = _cache_path()
    if os.path.isfile(path):
        try:
            with open(path) as f:
                if bool(json.load(f)["supported"]):
                    _cached = True
                    return True
            # a cached negative is advisory only — fall through so an
            # explicit REWRITING_TPU_TRY_PALLAS=1 can re-probe
        except Exception:
            pass
    if os.environ.get("REWRITING_TPU_TRY_PALLAS") != "1":
        _cached = False  # do not risk faulting a shared worker unasked
        return False
    try:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        env = dict(os.environ, REWRITING_TPU_REPO=repo)
        proc = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                              capture_output=True, timeout=timeout,
                              text=True, env=env)
        ok = proc.returncode == 0 and "PALLAS_OK" in proc.stdout
    except Exception:
        ok = False
    _cached = ok
    if ok:  # cache successes only (failures may be contention/transient)
        try:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "w") as f:
                json.dump({"supported": True}, f)
        except OSError:
            pass
    return ok


_FUSED_PROBE_SRC = r"""
import os, sys
sys.path.insert(0, os.environ["REWRITING_TPU_REPO"])
import numpy as np
import jax
import jax.numpy as jnp

# Probe the BlockSpec-only fused up-conv+blur kernel (pallas_upconv.py)
# — a different capability class from the halo-DMA kernels above: it
# needs no manual async copies and runs on this image's axon worker.
# NOTE: the first execution pays the worker-side Mosaic program load,
# which is highly variable on the axon runtime (4 s - 10+ min), hence
# the long timeout below.
from rewriting_tpu.ops.pallas_upconv import (upconv_blur_pallas,
                                             upconv_blur_reference)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(2, 8, 8, 128), jnp.float32)
wt = jnp.asarray(rng.randn(3, 3, 128, 128), jnp.float32) * 0.1
want = upconv_blur_reference(x, wt)
got = upconv_blur_pallas(x, wt)
assert float(jnp.max(jnp.abs(got - want))) < 1e-4 * float(
    jnp.max(jnp.abs(want))), "fused upconv kernel mismatch"
print("FUSED_UPCONV_OK")
"""

_fused_cached = None


def fused_upconv_supported(timeout: float = 900.0) -> bool:
    """True iff the BlockSpec-only fused up-conv+blur kernel ran
    successfully on this runtime (subprocess probe, success cached).
    Separate verdict from compiled_pallas_supported(): the halo-DMA FIR
    kernels fault runtimes where this kernel works."""
    global _fused_cached
    if _fused_cached is not None:
        return _fused_cached
    path = os.path.join(os.path.dirname(_cache_path()),
                        "pallas_fused_upconv.json")
    if os.path.isfile(path):
        try:
            with open(path) as f:
                if bool(json.load(f)["supported"]):
                    _fused_cached = True
                    return True
        except Exception:
            pass
    if os.environ.get("REWRITING_TPU_TRY_PALLAS") != "1":
        _fused_cached = False
        return False
    try:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        env = dict(os.environ, REWRITING_TPU_REPO=repo)
        proc = subprocess.run([sys.executable, "-c", _FUSED_PROBE_SRC],
                              capture_output=True, timeout=timeout,
                              text=True, env=env)
        ok = proc.returncode == 0 and "FUSED_UPCONV_OK" in proc.stdout
    except Exception:
        ok = False
    _fused_cached = ok
    if ok:
        try:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "w") as f:
                json.dump({"supported": True}, f)
        except OSError:
            pass
    return ok


if __name__ == "__main__":  # standalone probe (run before any TPU work)
    os.environ.setdefault("REWRITING_TPU_TRY_PALLAS", "1")
    print("compiled pallas supported:", compiled_pallas_supported())
    print("fused upconv supported:", fused_upconv_supported())
