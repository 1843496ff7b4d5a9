"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via
``--xla_force_host_platform_device_count=8`` (no TPU pod needed); the env
vars must be set before jax initializes its backends.
"""

import os
import pathlib

import numpy as np
import pytest

# NOTE: in this image the axon TPU plugin ignores the JAX_PLATFORMS env var;
# the config API is the reliable way to pin the platform.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Constrain the save/encode pools to the host's cores for the whole suite
# (inherited by notebook kernels and workerpool subprocesses): full-size
# writer pools sharing a 1-core CI host starved nbclient kernel
# heartbeats (the round-3 DeadKernelError flake class).  Production
# drivers keep the measured-fast caps — see workerpool.default_nworkers.
os.environ.setdefault("REWRITING_TPU_SAVE_WORKERS",
                      str(os.cpu_count() or 1))

# Persistent compilation cache across test runs.
jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


def pytest_collection_modifyitems(config, items):
    """Run the notebook-execution tests last: each spawns a full Jupyter
    kernel, and on a small host they are the tests most sensitive to
    leftover load — sequencing them after everything else keeps the
    full-suite run green (see docs/PERF_NOTES.md round 4)."""
    items.sort(key=lambda item: item.fspath.basename == "test_notebooks.py")


@pytest.fixture(scope="session")
def goldens():
    def load(name):
        path = GOLDEN_DIR / f"{name}.npz"
        if not path.exists():
            pytest.skip(f"golden fixture {name}.npz not generated "
                        f"(run scripts/make_goldens.py)")
        return np.load(path, allow_pickle=False)
    return load


def blob(h, w, cy, cx, r):
    """Circular test mask used across the rewriting tests."""
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.float32)


def tiny_channel_stylegan(size, s2d_tail_max_c=None, style_dim=32, n_mlp=1,
                          ch=None):
    """SeqStyleGAN2 with shrunken channels so the <=32-channel fast-tail
    gate triggers at CPU-testable sizes (shared by the fast-pipeline
    exactness and mesh-sharding tests)."""
    import rewriting_tpu.models.stylegan2 as sg
    orig = sg.CHANNELS
    table = ch or {4: 16, 8: 16, 16: 16, 32: 16, 64: 16,
                   128: 16, 256: 16, 512: 8, 1024: 8}
    sg.CHANNELS = lambda cm: dict(table)
    try:
        kw = {} if s2d_tail_max_c is None else \
            {"s2d_tail_max_c": s2d_tail_max_c}
        return sg.SeqStyleGAN2(size=size, style_dim=style_dim,
                               n_mlp=n_mlp, **kw)
    finally:
        sg.CHANNELS = orig
