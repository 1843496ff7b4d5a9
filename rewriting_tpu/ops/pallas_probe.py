"""Runtime detection for compiled Pallas support.

Compiled Pallas kernels fault this image's experimental 'axon' TPU worker
(it restarts, taking every process's device with it), so the kernels in
pallas_upfirdn.py cannot simply be try/except-ed in process.  This probe
runs a trivial Pallas kernel in a SUBPROCESS with a timeout: a crash,
fault, or hang is contained, and the verdict is cached on disk so the
(potentially destructive) experiment happens at most once per runtime.

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
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

def add_one(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0

x = jnp.zeros((8, 128), jnp.float32)
out = pl.pallas_call(
    add_one, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
assert float(out[0, 0]) == 1.0
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
        proc = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                              capture_output=True, timeout=timeout,
                              text=True)
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


if __name__ == "__main__":  # standalone probe (run before any TPU work)
    os.environ.setdefault("REWRITING_TPU_TRY_PALLAS", "1")
    print("compiled pallas supported:", compiled_pallas_supported())
