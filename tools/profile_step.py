#!/usr/bin/env python
"""Ablation profile of the train-step scan: where does the 90us/bunch go?

Times, on the real chip, scans that run (a) the full train body, (b) only the
gather-splice + target gather, (c) only the GEMM fwd/bwd with a pre-gathered
constant x, (d) only the optimizer update.  Differences localize the cost of
each stage without needing the (relay-hostile) trace profiler.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

import os
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpu_se.models import DEFAULT_LAYERSIZES, forward, init_params
from tpu_se.train import TrainHyper, make_train_state, train_chunk
from tpu_se.train.step import gather_splice
from tpu_se.losses import output_grad_and_alpha
from tpu_se.train.optim import sgd_momentum_update

layersizes = DEFAULT_LAYERSIZES
bunch, fea_dim, context = 128, 257, 7
n_frames = 102400 + 4096
n_bunches = 800

rng = np.random.default_rng(0)
noisy = jnp.asarray(rng.standard_normal((n_frames, fea_dim), dtype=np.float32))
clean = jnp.asarray(rng.standard_normal((n_frames, fea_dim), dtype=np.float32))
starts = jnp.asarray(rng.integers(0, n_frames - context,
                                  size=(n_bunches, bunch)).astype(np.int32))
hyper = TrainHyper(beta=1.0, ml=True, bunchsize=bunch, context=context,
                   targ_offset=3, grad_scale="parity")
params = init_params(1, layersizes)
state = make_train_state(params, layersizes[-1])
lr = 0.1


def sync(out):
    # Host read = robust completion barrier on the remote relay.
    return float(jnp.sum(jax.tree.leaves(out)[0]))


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1e3:8.2f} ms/chunk  {dt/n_bunches*1e6:7.2f} us/bunch")
    return dt


# (a) full step (chained: donation consumes the state)
st = make_train_state(init_params(1, layersizes), layersizes[-1])
st = train_chunk(st, noisy, clean, starts, lr, hyper)
sync(st.params[0]["w"])
t0 = time.perf_counter()
for _ in range(20):
    st = train_chunk(st, noisy, clean, starts, lr, hyper)
sync(st.params[0]["w"])
dt = (time.perf_counter() - t0) / 20
print(f"{'full train_chunk':28s} {dt*1e3:8.2f} ms/chunk  {dt/n_bunches*1e6:7.2f} us/bunch")


# (b) gather only: splice + targ gather, reduced to keep it live
@jax.jit
def gather_only(noisy, clean, starts):
    def body(acc, bs):
        x = gather_splice(noisy, bs, context)
        targ = clean[bs + 3]
        return acc + jnp.sum(x) + jnp.sum(targ), None
    acc, _ = jax.lax.scan(body, jnp.float32(0), starts)
    return acc

timeit("gather-splice + targ only",
       lambda: gather_only(noisy, clean, starts))

state = make_train_state(init_params(1, layersizes), layersizes[-1])


# (c) compute only: fixed x (contiguous slice, negligible), full fwd/bwd/update
@jax.jit
def compute_only(state, noisy, clean, starts):
    x0 = jax.lax.dynamic_slice(noisy, (0, 0), (bunch, fea_dim))
    x0 = jnp.tile(x0, (1, context))
    def body(carry, bs):
        params, velocity, _a = carry
        targ = jax.lax.dynamic_slice(clean, (0, 0), (bunch, fea_dim))
        out, vjp = jax.vjp(lambda p: forward(p, x0), params)
        dedx, alpha = output_grad_and_alpha(out, targ, 1.0, True)
        grads = vjp(dedx)[0]
        params, velocity = sgd_momentum_update(
            params, velocity, grads, lr, 0.9, 1e-5, bunch)
        return (params, velocity, alpha), None
    (p, v, a), _ = jax.lax.scan(body, (state.params, state.velocity,
                                       state.alpha), starts)
    return p[0]["w"]

timeit("compute only (fixed x)",
       lambda s: compute_only(s, noisy, clean, starts), state)


# (d) optimizer update only
@jax.jit
def update_only(state, starts):
    grads = jax.tree.map(jnp.zeros_like, state.params)
    def body(carry, _bs):
        params, velocity = carry
        params, velocity = sgd_momentum_update(
            params, velocity, grads, lr, 0.9, 1e-5, bunch)
        return (params, velocity), None
    (p, v), _ = jax.lax.scan(body, (state.params, state.velocity), starts)
    return p[0]["w"]

timeit("optimizer update only",
       lambda s: update_only(s, starts), state)
