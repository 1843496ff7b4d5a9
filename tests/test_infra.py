"""Infra utilities: pidfile exclusion, worker pools, native PNG encoder,
deterministic samplers (reference self-test vectors), show/easydict."""

import os
import subprocess
import sys

import numpy as np
import pytest

from rewriting_tpu.utils import pidfile, show
from rewriting_tpu.utils.easydict import EasyDict
from rewriting_tpu.utils.imgsave import SaveImagePool, save_image_set
from rewriting_tpu.utils.sampler import (FixedRandomSubsetSampler,
                                         FixedSubsetSampler,
                                         coordinate_sample)
from rewriting_tpu.utils.workerpool import WorkerBase, WorkerPool
from rewriting_tpu import native


# ---------------------------------------------------------------------------
# samplers — the reference's published determinism vectors
# (reference utils/sampler.py:148-179)
# ---------------------------------------------------------------------------

def test_coordinate_sample_vectors():
    np.testing.assert_equal(
        coordinate_sample((26, 26), 10, range(101, 102)),
        [[[14, 0, 12, 11, 8, 13, 11, 20, 7, 20],
          [9, 22, 7, 11, 23, 18, 21, 15, 2, 5]]])
    np.testing.assert_equal(
        coordinate_sample((13, 13), 10, range(101, 102)),
        [[[7, 0, 6, 5, 4, 6, 5, 10, 3, 10],
          [4, 11, 3, 5, 11, 9, 10, 7, 1, 2]]])
    np.testing.assert_equal(
        coordinate_sample((13, 13), 10, range(100, 102), flat=True),
        [[8, 24, 67, 103, 87, 79, 138, 94, 98, 53],
         [95, 11, 81, 70, 63, 87, 75, 137, 40, 132]])


def test_fixed_random_subset_sampler():
    fss = FixedRandomSubsetSampler(range(10))
    assert list(fss) == [6, 8, 9, 7, 5, 3, 0, 4, 1, 2]
    fss = FixedRandomSubsetSampler(range(10), 3, 8)
    assert list(fss) == [7, 5, 3, 0, 4]
    fss = FixedRandomSubsetSampler(
        [(i, i % 3) for i in range(10)]).class_subset(class_filter=1)
    assert list(fss) == [7, 4, 1]


def test_fixed_subset_sampler():
    s = FixedSubsetSampler([5, 3, 9])
    assert len(s) == 3 and s[1] == 3
    assert s.dereference([0, 2]) == [5, 9]
    assert list(s.subset([2, 0])) == [9, 5]


# ---------------------------------------------------------------------------
# pidfile
# ---------------------------------------------------------------------------

def test_pidfile_claim_and_done(tmp_path):
    d = str(tmp_path / "job")
    os.makedirs(d)
    lock = os.path.join(d, "lockfile.pid")
    assert pidfile.pidfile_taken(lock) is None      # we claim it
    assert os.path.exists(lock)
    # a second process cannot claim it
    code = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "from rewriting_tpu.utils import pidfile; "
         "sys.exit(0 if pidfile.pidfile_taken(%r) else 1)"
         % (os.getcwd(), lock)],
        capture_output=True).returncode
    assert code == 0  # holder string returned -> exit 0
    pidfile.mark_job_done(d)
    assert os.path.isfile(os.path.join(d, "done.txt"))
    # exit_if_job_done exits(0) on done dirs
    code = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "from rewriting_tpu.utils import pidfile; "
         "pidfile.exit_if_job_done(%r); sys.exit(3)"
         % (os.getcwd(), d)],
        capture_output=True).returncode
    assert code == 0


def test_pidfile_stale_takeover(tmp_path):
    lock = str(tmp_path / "lockfile.pid")
    import socket
    with open(lock, "w") as f:
        f.write(f"{socket.gethostname()}:999999999\n")  # dead pid
    assert pidfile.pidfile_taken(lock) is None  # stale lock taken over


# ---------------------------------------------------------------------------
# workerpool + imgsave + native encoder
# ---------------------------------------------------------------------------

class _SquareWriter(WorkerBase):
    def work(self, x, path):
        with open(path, "w") as f:
            f.write(str(x * x))


def test_workerpool(tmp_path):
    pool = WorkerPool(worker=_SquareWriter, nworkers=3)
    for i in range(20):
        pool.add(i, str(tmp_path / f"f{i}.txt"))
    pool.join()
    for i in range(20):
        assert open(tmp_path / f"f{i}.txt").read() == str(i * i)


def test_native_png_roundtrip():
    if not native.native_available():
        pytest.skip("native png encoder unavailable (no g++/zlib)")
    import PIL.Image
    import io
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (37, 61, 3), np.uint8)
    data = native.encode_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    decoded = np.asarray(PIL.Image.open(io.BytesIO(data)))
    np.testing.assert_array_equal(decoded, img)


def test_save_image_set(tmp_path):
    rng = np.random.RandomState(1)
    imgs = [rng.uniform(-1, 1, (8, 8, 3)).astype(np.float32)
            for _ in range(4)]
    pattern = str(tmp_path / "img_%d.png")
    save_image_set(imgs, pattern)
    import PIL.Image
    for i in range(4):
        im = PIL.Image.open(pattern % i)
        assert im.size == (8, 8)


def test_save_image_pool(tmp_path):
    pool = SaveImagePool(nworkers=2)
    rng = np.random.RandomState(2)
    arr = rng.randint(0, 256, (8, 8, 3), np.uint8)
    for i in range(6):
        pool.add(arr, str(tmp_path / f"p{i}.png"))
    pool.join()
    import PIL.Image
    got = np.asarray(PIL.Image.open(tmp_path / "p3.png"))
    np.testing.assert_array_equal(got, arr)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def test_easydict():
    d = EasyDict(a=1, b={"c": 2})
    assert d.a == 1 and d.b.c == 2
    d.x = {"y": 3}
    assert d.x.y == 3
    del d.a
    assert "a" not in d


def test_show_html():
    out = show.html("hello", [np.zeros((4, 4, 3), np.float32), "x"],
                    {"k": "v"})
    assert "hello" in out and "img src=\"data:image/png" in out
    assert "<table>" in out


# ---------------------------------------------------------------------------
# multi-host job sharding (utils/hostshard.py + metrics/experiments.py DAG)
# ---------------------------------------------------------------------------

def test_shard_units_strided_and_env(monkeypatch):
    from rewriting_tpu.utils import hostshard
    units = list(range(10))
    assert hostshard.shard_units(units, 0, 3) == [0, 3, 6, 9]
    assert hostshard.shard_units(units, 2, 3) == [2, 5, 8]
    # union over hosts covers everything exactly once
    all_units = sum((hostshard.shard_units(units, i, 3)
                     for i in range(3)), [])
    assert sorted(all_units) == units
    monkeypatch.setenv("RANK", "1")
    monkeypatch.setenv("WORLD_SIZE", "2")
    assert hostshard.process_identity() == (1, 2)


def test_claim_units_done_markers(tmp_path):
    from rewriting_tpu.utils import hostshard
    ran = []
    for unit, mark in hostshard.claim_units(["a", "b", "c"],
                                            str(tmp_path)):
        ran.append(unit)
        if unit != "b":
            mark()  # 'b' left incomplete
    assert ran == ["a", "b", "c"]
    # restart: only the incomplete unit is reclaimed
    ran2 = [u for u, m in hostshard.claim_units(["a", "b", "c"],
                                                str(tmp_path))]
    assert ran2 == ["b"]


def test_experiments_dag_two_hosts(tmp_path):
    """The experiment DAG runs to completion across two simulated hosts
    with dependency ordering and no duplicated work."""
    from rewriting_tpu.metrics import experiments
    statedir = str(tmp_path / "exp")
    log = {0: [], 1: []}

    def make_runner(host):
        def runner(cmd):
            log[host].append(cmd)
            return 0
        return runner

    # alternate hosts until the DAG drains (simulates concurrent hosts
    # polling a shared statedir)
    # one frontier-round per call, alternating hosts (simulates two hosts
    # polling a shared statedir concurrently)
    for _ in range(8):
        experiments.run_pipeline(statedir, runner=make_runner(0),
                                 process_index=0, process_count=2,
                                 max_rounds=1)
        experiments.run_pipeline(statedir, runner=make_runner(1),
                                 process_index=1, process_count=2,
                                 max_rounds=1)
    all_cmds = log[0] + log[1]
    assert len(all_cmds) == len(experiments.STAGES)  # no duplicates
    assert len(log[0]) > 0 and len(log[1]) > 0      # both hosts worked
    order = {cmd: i for i, cmd in enumerate(log[0])}
    # dependency ordering within the global completion sequence: a stage's
    # done-marker must exist before any dependent ran; spot-check via
    # re-running -> nothing left
    final = experiments.run_pipeline(statedir, runner=make_runner(0))
    assert final == {}


def test_experiments_failure_stops(tmp_path):
    from rewriting_tpu.metrics import experiments
    statedir = str(tmp_path / "exp")

    def runner(cmd):
        return 1 if "seg_stats" in cmd else 0

    status = experiments.run_pipeline(statedir, runner=runner)
    assert any(v.startswith("failed") for v in status.values())
    # failed stage has no done marker -> retried on next run
    failed = [k for k, v in status.items() if v.startswith("failed")][0]
    import os
    assert not os.path.isfile(os.path.join(statedir, failed, "done.txt"))


def test_experiments_orphan_stage_is_stolen(tmp_path):
    """A tail stage whose strided index never lands on any host must be
    stolen rather than orphaned (frontier shrinkage makes strided
    assignment unstable)."""
    from rewriting_tpu.metrics import experiments
    stages = [("a", "cmd_a", ()), ("b", "cmd_b", ("a",)),
              ("c", "cmd_c", ("a", "b"))]
    statedir = str(tmp_path / "exp")
    ran = []

    def runner(cmd):
        ran.append(cmd)
        return 0

    # host 1 of 2: its strided share of 1-element frontiers is always
    # empty (ready[1::2] == []); stealing must still drain the DAG
    status = experiments.run_pipeline(statedir, stages=stages,
                                      runner=runner, process_index=1,
                                      process_count=2)
    assert ran == ["cmd_a", "cmd_b", "cmd_c"]
    assert all(v == "done" for v in status.values())


def test_native_png_decoder_parity(tmp_path):
    """The C++ PNG decoder matches PIL exactly on its supported subset
    (8-bit grey/RGB/RGBA, all filter types) and defers otherwise."""
    import io
    import PIL.Image
    from rewriting_tpu.native import (decode_png, encode_png,
                                      read_image_rgb)
    rng = np.random.RandomState(0)
    # native-encoder roundtrip
    img = rng.randint(0, 255, (37, 53, 3), np.uint8)
    data = encode_png(img)
    if data is not None:
        np.testing.assert_array_equal(decode_png(data), img)
    # PIL-encoded variants (PIL picks varied row filters) incl. smooth
    # gradients that trigger Average/Paeth filters
    grad = (np.arange(40)[:, None] * np.arange(60)[None, :] % 256)
    cases = [(img, "RGB"),
             (np.dstack([grad, grad[::-1], grad // 2]).astype(np.uint8),
              "RGB"),
             (rng.randint(0, 255, (20, 31, 4), np.uint8), "RGBA"),
             (rng.randint(0, 255, (20, 31), np.uint8), "L")]
    for arr, mode in cases:
        b = io.BytesIO()
        PIL.Image.fromarray(arr.astype(np.uint8), mode).save(b,
                                                             format="png")
        want = np.asarray(PIL.Image.open(
            io.BytesIO(b.getvalue())).convert("RGB"))
        got = decode_png(b.getvalue())
        assert got is not None
        np.testing.assert_array_equal(got, want, err_msg=mode)
    # palette PNGs defer to PIL via read_image_rgb
    pal = PIL.Image.fromarray(img).convert("P")
    p = tmp_path / "pal.png"
    pal.save(p)
    want = np.asarray(PIL.Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(read_image_rgb(str(p)), want)


def test_read_batches_threaded_reader(tmp_path):
    """native.read_batches (the streaming drivers' thread-pool decode):
    order-preserving, batch-shaped, tail-carrying, and byte-identical to
    per-file read_image_rgb."""
    import PIL.Image
    from rewriting_tpu.native import read_batches, read_image_rgb
    rng = np.random.RandomState(0)
    n, bs = 23, 8  # deliberately non-multiple: tail batch of 7
    paths = []
    imgs = []
    for i in range(n):
        img = rng.randint(0, 255, (16, 16, 3), np.uint8)
        p = tmp_path / f"{i}.png"
        PIL.Image.fromarray(img).save(p)
        paths.append(str(p))
        imgs.append(img)
    batches = list(read_batches(paths, bs, workers=4, readahead=2))
    assert [b.shape[0] for b in batches] == [8, 8, 7]
    got = np.concatenate(batches)
    np.testing.assert_array_equal(got, np.stack(imgs))
    for b in batches:
        assert b.dtype == np.uint8 and b.shape[1:] == (16, 16, 3)
    # parity with the single-file reader (shared decode path)
    np.testing.assert_array_equal(batches[0][0], read_image_rgb(paths[0]))
    # empty input -> no batches, no hang
    assert list(read_batches([], bs)) == []
    # abandoning the generator mid-stream must not leak/hang the pool
    gen = read_batches(paths, bs, workers=2)
    next(gen)
    gen.close()


@pytest.mark.slow
def test_bench_smoke_driver_contract():
    """The driver parses bench.py's LAST stdout line as one JSON object
    with metric/value/unit/vs_baseline keys — pin that contract."""
    import json
    import subprocess
    import sys
    import os
    repo = os.path.join(os.path.dirname(__file__), "..")
    proc = subprocess.run(
        [sys.executable, "bench.py", "--smoke"], cwd=repo,
        capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    row = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline",
                "rank1_edit_solve_ms", "rank1_fast_linear_solve_ms",
                "batched_8edit_ms_per_edit"):
        assert key in row, key
    assert row["unit"] == "images/sec/chip"
    assert row["value"] > 0


@pytest.mark.slow
def test_bench_deadline_skips_but_emits(tmp_path):
    """The round-4 data-loss fix (VERDICT item 1): with an expired
    wall-clock budget, bench.py must still exit 0, skip the guarded
    stages into skipped_after_deadline, and print the final JSON with
    the unguarded headline present."""
    import json
    import subprocess
    import sys
    import os
    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ, REWRITING_TPU_BENCH_DEADLINE="0")
    proc = subprocess.run(
        [sys.executable, "bench.py", "--smoke"], cwd=repo, env=env,
        capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    row = json.loads(proc.stdout.strip().splitlines()[-1])
    # the unguarded headline ran; every deadline-gated stage was skipped
    assert row["value"] > 0
    assert row.get("skipped_after_deadline"), row.keys()
    assert "rank1_edit_solve_ms" not in row
    # partials were emitted along the way
    assert "#partial " in proc.stderr


def test_orbax_params_roundtrip(tmp_path):
    """Orbax save/restore of a params pytree, including restore into a
    mesh-sharded layout (the TPU-fleet persistence path)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rewriting_tpu.models import ProgressiveGenerator
    from rewriting_tpu.parallel import make_mesh
    from rewriting_tpu.utils.paramio import (load_params_orbax,
                                             save_params_orbax)

    model = ProgressiveGenerator(sizes=[8, 8, 8])
    params = model.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt")
    save_params_orbax(path, params)
    # plain restore
    back = load_params_orbax(path)
    np.testing.assert_allclose(
        np.asarray(back["layer1.conv"]["weight"]),
        np.asarray(params["layer1.conv"]["weight"]))
    # restore into a replicated-on-mesh layout
    mesh = make_mesh(4)
    like = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), params)
    sharded = load_params_orbax(path, like=like)
    w = sharded["layer1.conv"]["weight"]
    assert len(w.sharding.device_set) == 4
    out = model(sharded, jnp.zeros((1, model.z_dim)))
    assert np.isfinite(np.asarray(out)).all()


def test_async_fetcher_order_window_and_errors():
    """utils.fetcher.AsyncFetcher (the drivers' multi-stream device->host
    download): delivers (tag, array) pairs in submission order regardless
    of stream count, bounds the in-flight window, drains on close, and
    propagates a failed fetch to the submitting thread."""
    import threading

    from rewriting_tpu.utils.fetcher import AsyncFetcher

    got = []
    in_flight_high = 0
    lock = threading.Lock()

    class Probe:
        """Array-like whose np.asarray conversion records concurrency."""

        def __init__(self, i, delay):
            self.i, self.delay = i, delay

        def __array__(self, dtype=None, copy=None):
            nonlocal in_flight_high
            import time as _t
            with lock:
                Probe.live += 1
                in_flight_high = max(in_flight_high, Probe.live)
            _t.sleep(self.delay)
            with lock:
                Probe.live -= 1
            return np.full((2, 2), self.i, np.int32)

    Probe.live = 0
    with AsyncFetcher(lambda tag, arr: got.append((tag, int(arr[0, 0]))),
                      streams=3, window=2) as f:
        # reversed delays: later submissions finish first; order must hold
        for i in range(8):
            f.submit(i, Probe(i, delay=0.02 * (8 - i) / 8))
    assert got == [(i, i) for i in range(8)]
    assert in_flight_high >= 2  # fetches genuinely overlapped
    # window bound: never more than window+1 submitted-but-unconsumed
    # (submit blocks by draining the oldest once the window is full)

    class Boom:
        def __array__(self, dtype=None, copy=None):
            raise RuntimeError("link down")

    f2 = AsyncFetcher(lambda tag, arr: None, streams=2, window=1)
    f2.submit(0, Boom())
    try:
        f2.drain()
        raise AssertionError("fetch error was swallowed")
    except RuntimeError as e:
        assert "link down" in str(e)
    finally:
        f2._futs.clear()
        f2.close()

    # plain numpy passthrough (CPU jax arrays in tests hit this path)
    outs = []
    with AsyncFetcher(lambda t, a: outs.append(a.sum()), streams=1) as f3:
        f3.submit("a", np.ones((3,)))
    assert outs == [3.0]
