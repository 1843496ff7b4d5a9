"""The rank-constrained linear-associative-memory weight solve.

The reference runs a Python-level Adam loop mutating the conv weight in
place, re-projecting onto ``ortho_weight + P_context(weight)`` every
``piter`` steps (reference: rewrite/ganrewrite.py:254-298), with
``projected_conv`` einsums (:806-813) and a float64 symeig ZCA (:821-826).

Here the whole optimization is ONE jitted ``lax.scan``: forward + backward
of the small target window, the Adam update (optax), and the periodic
low-rank projection all compile into a single XLA program resident in HBM —
the reference's hot loop (2001 Python iterations with kernel launches)
becomes a single device dispatch.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from ..ops import precision


def _solve_jit(fn, static_argnames):
    """Backend-aware jit for the solve scans: on TPU, raise the scoped
    vmem scratch limit to 64 MiB — measured 1149 ms -> 624 ms on the
    default 2001-iter projected insert (v5e; the bigger scratch lets XLA
    keep the weight/Adam state vmem-resident across the scan body).
    Resolved lazily per backend so CPU tests run the plain jit."""
    from ..ops.jitopts import tuned_jit
    return tuned_jit(fn, static_argnames=static_argnames)


def projected_conv(weight, direction):
    """Project conv weight onto the span of context directions along the
    input-channel axis. Weight is torch-ordered: (O,I,kh,kw) for ProgGAN or
    (G,O,I,kh,kw) for StyleGAN; direction is (rank, I) with orthonormal rows
    (reference ganrewrite.py:806-813)."""
    if weight.ndim == 5:
        cosine = jnp.einsum("goiyx,di->godyx", weight, direction)
        return jnp.einsum("godyx,di->goiyx", cosine, direction)
    cosine = jnp.einsum("oiyx,di->odyx", weight, direction)
    return jnp.einsum("odyx,di->oiyx", cosine, direction)


def rank_one_conv(weight, direction):
    """(reference ganrewrite.py:816-818)"""
    cosine = jnp.sum(weight * direction[None, :, None, None], axis=1,
                     keepdims=True)
    return cosine * direction[None, :, None, None]


def zca_from_cov(cov) -> jnp.ndarray:
    """C^{-1/2} via float64 eigendecomposition on host (TPUs have no native
    f64; this runs once at rewriter setup). Mirrors reference numerics:
    eigvals' sqrt clamped at 1e-20 before reciprocal (ganrewrite.py:821-826).
    """
    c = np.asarray(cov, np.float64)
    evals, evecs = np.linalg.eigh(c)
    inv_sqrt = 1.0 / np.maximum(np.sqrt(np.maximum(evals, 0.0)), 1e-20)
    zca = (evecs * inv_sqrt[None, :]) @ evecs.T
    return jnp.asarray(zca.astype(np.asarray(cov).dtype))


def solve_spd(c_matrix, k):
    """x = C^{-1} k for SPD C — the covariance-adjusted key
    (reference uses torch.lstsq-as-solve, ganrewrite.py:101-105).
    k: (C,) or (N, C) rows. Runs in float64 on host for stability."""
    c = np.asarray(c_matrix, np.float64)
    kk = np.asarray(k, np.float64)
    single = kk.ndim == 1
    x = np.linalg.solve(c, kk[:, None] if single else kk.T)
    out = x[:, 0] if single else x.T
    return jnp.asarray(out.astype(np.asarray(k).dtype))


# ---------------------------------------------------------------------------
# insert — the jitted rank-constrained solve
# ---------------------------------------------------------------------------

@functools.partial(
    _solve_jit,
    static_argnames=("window_fn", "niter", "piter", "low_rank_insert",
                     "low_rank_gradient"))
def _insert_scan(window_fn, weight0, goal_in, goal_out, direction,
                 niter: int, piter: int, lr: float,
                 low_rank_insert: bool, low_rank_gradient: bool):
    ortho = weight0 - projected_conv(weight0, direction)
    opt = optax.adam(lr)  # same update rule/defaults as torch.optim.Adam

    def loss_fn(w):
        return jnp.mean(jnp.abs(goal_out - window_fn(w, goal_in)))

    def adam_step(carry):
        w, opt_state = carry
        loss, grad = jax.value_and_grad(loss_fn)(w)
        if low_rank_gradient:
            grad = projected_conv(grad, direction)
        updates, opt_state = opt.update(grad, opt_state, w)
        w = optax.apply_updates(w, updates)
        return (w, opt_state), loss

    carry = (weight0, opt.init(weight0))

    if niter <= 0:
        return weight0, jnp.zeros((0,), weight0.dtype)

    if not low_rank_insert:
        (w, _), losses = lax.scan(lambda c, _: adam_step(c), carry, None,
                                  length=niter, unroll=min(piter, 8))
        return w, losses

    # Projection happens after the Adam step at iterations
    # {0, piter, 2*piter, ...} U {niter-1} (reference ganrewrite.py:291-294).
    # Instead of a per-iteration lax.cond, place the projections statically:
    # a prologue step (it=0) + projection, then full chunks of `piter`
    # unrolled steps ending exactly on a projection iteration, then a tail.
    # Identical trajectory, ~zero loop-control overhead, and XLA can fuse
    # and pipeline across the unrolled chunk body.
    def project(w):
        return ortho + projected_conv(w, direction)

    carry, loss0 = adam_step(carry)
    carry = (project(carry[0]), carry[1])
    all_losses = [loss0[None]]
    nchunk, rem = divmod(niter - 1, piter)

    if nchunk:
        def chunk(carry, _):
            # inner scan, not Python unrolling: a 10x-unrolled body of
            # conv fwd+bwd pairs measured ~1.7x slower per iteration on
            # TPU (scheduling/vmem pressure), while the nested scan keeps
            # the per-step program small and still removes the cond
            carry, losses = lax.scan(lambda c, _: adam_step(c), carry,
                                     None, length=piter)
            return (project(carry[0]), carry[1]), losses

        carry, chunk_losses = lax.scan(chunk, carry, None, length=nchunk)
        all_losses.append(chunk_losses.reshape(-1))

    if rem:
        # tail of rem un-projected steps (scan, not Python-unrolled: a
        # large piter would otherwise trace rem sequential conv pairs
        # into the program), then the final it == niter-1 projection
        carry, tail_losses = lax.scan(lambda c, _: adam_step(c), carry,
                                      None, length=rem)
        carry = (project(carry[0]), carry[1])
        all_losses.append(tail_losses)

    return carry[0], jnp.concatenate(all_losses)


def insert_solve(window_fn: Callable, weight0, goal_in, goal_out, direction,
                 niter: int = 2001, piter: int = 10, lr: float = 0.05,
                 low_rank_insert: bool = True,
                 low_rank_gradient: bool = False,
                 update_callback: Optional[Callable] = None,
                 return_timing: bool = False):
    """Solve min_w L1(goal_out, window_fn(w, goal_in)) subject to the
    low-rank context constraint. window_fn(w, goal_in) must be pure and
    traceable. Returns (weight, losses[, elapsed_ms])."""
    import time
    direction = jnp.asarray(direction)
    if return_timing:
        jax.block_until_ready(weight0)
        t0 = time.time()
    with precision.schedule_suspended():  # edit math pins the global tier
        w, losses = _insert_scan(window_fn, weight0, goal_in, goal_out,
                                 direction, niter, piter, lr,
                                 low_rank_insert, low_rank_gradient)
    if return_timing:
        jax.block_until_ready(w)
        elapsed_ms = (time.time() - t0) * 1000.0
    if update_callback is not None:
        for it, loss in enumerate(np.asarray(losses)):
            update_callback(it, loss)
    if return_timing:
        return w, losses, elapsed_ms
    return w, losses


# ---------------------------------------------------------------------------
# fast linear insert: exploit the low-rank structure.  With w = w0 + Λ·D,
# conv(x, w) = conv(x, w0) + conv(D·x, Λ): the expensive full conv is
# CONSTANT over the optimization, so precompute it once; per-iteration work
# is a rank-channel conv plus the window tail — hundreds of times fewer
# FLOPs than re-running the window (the reference recomputes the full conv
# every one of its 2001 iterations).
# ---------------------------------------------------------------------------

@functools.partial(
    _solve_jit,
    static_argnames=("conv_fn", "tail_fn", "niter", "use_demod"))
def _fast_linear_scan(conv_fn, tail_fn, goal, goal_out, w0, direction,
                      scale: float, niter: int, lr: float,
                      use_demod: bool):
    bag, params = goal
    x = bag["fmap"]
    rank = direction.shape[0]
    xD = jnp.einsum("di,bhwi->bhwd", direction, x)
    w0_4d = w0[0] if w0.ndim == 5 else w0
    base = conv_fn(x, w0_4d * scale)            # constant across iters
    if use_demod:
        style2 = jnp.square(bag["style"])       # (B, I)

    def lift(lam4):
        # Λ (O, rank, kh, kw) -> full-weight delta (O, I, kh, kw)
        return jnp.einsum("odyx,di->oiyx", lam4, direction)

    def y_of(lam4):
        out = base + conv_fn(xD, lam4 * scale)
        if use_demod:
            w = w0_4d + lift(lam4)
            w_sq = jnp.sum(jnp.square(w * scale), axis=(-2, -1))  # (O, I)
            demod = lax.rsqrt(style2 @ w_sq.T + 1e-8)
            out = out * demod[:, None, None, :]
        newbag = dict(bag)
        newbag["fmap"] = out
        return tail_fn(params, newbag)["fmap"]

    def loss_fn(lam4):
        return jnp.mean(jnp.abs(goal_out - y_of(lam4)))

    o = w0_4d.shape[0]
    kh, kw = w0_4d.shape[-2:]
    lam0 = jnp.zeros((o, rank, kh, kw), w0.dtype)
    opt = optax.adam(lr)

    def step(carry, _):
        lam, opt_state = carry
        loss, grad = jax.value_and_grad(loss_fn)(lam)
        updates, opt_state = opt.update(grad, opt_state, lam)
        lam = optax.apply_updates(lam, updates)
        return (lam, opt_state), loss

    (lam, _), losses = lax.scan(step, (lam0, opt.init(lam0)), None,
                                length=niter)
    w_final = w0_4d + lift(lam)
    if w0.ndim == 5:
        w_final = w_final[None]
    return w_final, losses


def fast_linear_insert_solve(conv_fn, tail_fn, goal_in_bag, params,
                             goal_out, w0, direction, scale: float,
                             niter: int = 2001, lr: float = 0.05,
                             use_demod: bool = False,
                             update_callback=None,
                             return_timing: bool = False):
    """Low-rank-decomposed linear insert (see _fast_linear_scan).

    conv_fn(x, kernel_oihw) must implement the window's bare linear conv
    (including any upsampling), WITHOUT weight scaling or demodulation —
    those are handled here.  tail_fn(params, bag) runs the window stages
    after the conv.  Mathematically identical to linear_insert_solve
    (same Λ parameterization, same Adam trajectory)."""
    import time
    direction = jnp.asarray(direction)
    if return_timing:
        jax.block_until_ready(w0)
        t0 = time.time()
    with precision.schedule_suspended():  # edit math pins the global tier
        w, losses = _fast_linear_scan(conv_fn, tail_fn,
                                      (goal_in_bag, params), goal_out, w0,
                                      direction, scale, niter, lr, use_demod)
    if return_timing:
        jax.block_until_ready(w)
        elapsed_ms = (time.time() - t0) * 1000.0
    if update_callback is not None:
        for it, loss in enumerate(np.asarray(losses)):
            update_callback(it, loss)
    if return_timing:
        return w, losses, elapsed_ms
    return w, losses


# ---------------------------------------------------------------------------
# linear_insert — learn Lambda with w1 = w0 + Lambda @ D
# ---------------------------------------------------------------------------

@functools.partial(_solve_jit, static_argnames=("window_fn", "niter"))
def _linear_insert_scan(window_fn, weight0, goal_in, goal_out, direction,
                        niter: int, lr: float):
    rank = direction.shape[0]
    if weight0.ndim == 5:
        g, o, i, kh, kw = weight0.shape
        lam0 = jnp.zeros((g, o, rank, kh, kw), weight0.dtype)

        def w_of(lam):
            return weight0 + jnp.einsum("godyx,di->goiyx", lam, direction)
    else:
        o, i, kh, kw = weight0.shape
        lam0 = jnp.zeros((o, rank, kh, kw), weight0.dtype)

        def w_of(lam):
            return weight0 + jnp.einsum("odyx,di->oiyx", lam, direction)

    opt = optax.adam(lr)

    def loss_fn(lam):
        return jnp.mean(jnp.abs(goal_out - window_fn(w_of(lam), goal_in)))

    def step(carry, _):
        lam, opt_state = carry
        loss, grad = jax.value_and_grad(loss_fn)(lam)
        updates, opt_state = opt.update(grad, opt_state, lam)
        lam = optax.apply_updates(lam, updates)
        return (lam, opt_state), loss

    (lam, _), losses = lax.scan(step, (lam0, opt.init(lam0)),
                                None, length=niter)
    return w_of(lam), losses


def linear_insert_solve(window_fn, weight0, goal_in, goal_out, direction,
                        niter: int = 2001, lr: float = 0.05,
                        update_callback=None, return_timing: bool = False):
    """The reference's alternative parameterization: the update is exactly
    Lambda·D by construction instead of by projection
    (reference ganrewrite.py:201-252)."""
    import time
    direction = jnp.asarray(direction)
    if return_timing:
        jax.block_until_ready(weight0)
        t0 = time.time()
    with precision.schedule_suspended():  # edit math pins the global tier
        w, losses = _linear_insert_scan(window_fn, weight0, goal_in,
                                        goal_out, direction, niter, lr)
    if return_timing:
        jax.block_until_ready(w)
        elapsed_ms = (time.time() - t0) * 1000.0
    if update_callback is not None:
        for it, loss in enumerate(np.asarray(losses)):
            update_callback(it, loss)
    if return_timing:
        return w, losses, elapsed_ms
    return w, losses
