"""Multi-host work-unit sharding for experiment pipelines.

The reference scales across machines at the *job* level: each host loops
over work units and claims them with pidfile locks (reference
utils/pidfile.py + e.g. baselines/neural_best_buddies/script.sh, which
shards per-image work by pid).  On a TPU pod the natural analog is the JAX
multi-process runtime: every host runs the same program, discovers its
``jax.process_index()``/``process_count()``, takes the strided slice of
the work-unit list, and drops per-unit done-markers so restarts (elastic
or preemption recovery) skip completed units on any host — done-markers
are plain files, so they are multi-host-safe on any shared filesystem
(NFS/GCS-fuse).

Two layers compose:
- ``shard_units``: deterministic strided assignment (no coordination);
- ``claim_units``: optional lock-based work stealing for heterogeneous
  hosts (wraps pidfile's lock + done protocol per unit).
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Iterator, List, Optional, Sequence

from . import pidfile


def process_identity(process_index: Optional[int] = None,
                     process_count: Optional[int] = None):
    """(index, count) from explicit args, the JAX distributed runtime, or
    env pairs: REWRITING_TPU_SHARD/REWRITING_TPU_NUM_SHARDS, or
    RANK/WORLD_SIZE (generic launchers).  Both halves of a pair must be
    set (k8s indexed Jobs provide only JOB_COMPLETION_INDEX, so the count
    must come from one of these — there is no standard count env var)."""
    if process_index is not None and process_count is not None:
        return int(process_index), int(process_count)
    # Consult jax WITHOUT triggering backend initialization: calling
    # jax.process_count() cold initializes the backend, which is a device
    # dependency a pure job-sharding decision must not take (during a
    # TPU-worker outage, backend init can hang 20+ min).  Two init-free
    # sources, each probed independently so a private-API change in one
    # cannot mask the other:
    try:
        # (a) an explicit jax.distributed.initialize() (multi-host pods)
        # records identity in the distributed client before any device use
        from jax._src import distributed
        if distributed.global_state.client is not None:
            return (int(distributed.global_state.process_id),
                    int(distributed.global_state.num_processes))
    except Exception:
        pass
    try:
        # (b) a backend that is ALREADY live in this process (implicit
        # multi-host identity, e.g. Cloud TPU without explicit initialize)
        import jax
        from jax._src import xla_bridge
        if xla_bridge.backends_are_initialized() and jax.process_count() > 1:
            return jax.process_index(), jax.process_count()
    except Exception:
        pass
    for i_var, n_var in (("REWRITING_TPU_SHARD", "REWRITING_TPU_NUM_SHARDS"),
                         ("RANK", "WORLD_SIZE")):
        env_i, env_n = os.environ.get(i_var), os.environ.get(n_var)
        if env_i is not None and env_n is not None:
            return int(env_i), int(env_n)
    return 0, 1


def shard_units(units: Sequence, process_index: Optional[int] = None,
                process_count: Optional[int] = None) -> List:
    """Deterministic strided slice of the work-unit list for this host.
    Strided (not blocked) so early units of every stride finish first and
    partial runs cover the range uniformly."""
    i, n = process_identity(process_index, process_count)
    return list(units[i::n])


def claim_units(units: Iterable, workdir: str,
                unit_name: Callable = str,
                redo: bool = False) -> Iterator:
    """Lock-based work stealing over shared storage: yields each unit this
    process successfully claims (skipping done/locked ones); the caller
    must call ``mark_done(unit)`` — returned as ``(unit, mark_done)``
    pairs — after completing it.  Restart-safe: done units are skipped,
    stale locks from dead local pids are taken over (reference
    pidfile.py:39-63 semantics per unit)."""
    for unit in units:
        d = os.path.join(workdir, unit_name(unit))
        os.makedirs(d, exist_ok=True)
        donefile = os.path.join(d, "done.txt")
        if os.path.isfile(donefile) and not redo:
            continue
        if os.path.isfile(donefile):
            os.remove(donefile)
        lockpath = os.path.join(d, "lockfile.pid")
        if pidfile.pidfile_taken(lockpath, verbose=False):
            continue

        def mark_done(d=d):
            pidfile.mark_job_done(d)
        try:
            yield unit, mark_done
        finally:
            # release on resume: an un-marked unit becomes claimable again
            # (a crash mid-unit leaves the lock; peers take it over via the
            # stale-pid rule, pidfile.py:69-77)
            try:
                os.remove(lockpath)
            except OSError:
                pass
