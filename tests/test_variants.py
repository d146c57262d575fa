"""Variant-config tests: ReLU build, dropout training, decode postprocess."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_se.models import forward, init_params
from tpu_se.train import TrainHyper, make_train_state, train_chunk
from tpu_se.infer.decode import postprocess_lps, smooth_power


def _problem(seed=0, dim=4, ctx=3, m=8, n_bunches=2, n_frames=64):
    rng = np.random.default_rng(seed)
    noisy = rng.normal(size=(n_frames, dim)).astype(np.float32)
    clean = rng.normal(size=(n_frames, dim)).astype(np.float32)
    starts = rng.integers(0, n_frames - ctx,
                          size=(n_bunches, m)).astype(np.int32)
    layersizes = (dim * ctx, 9, 9, dim)
    params = init_params(seed + 1, layersizes, flag=0, beta=0.5)
    return noisy, clean, starts, params, layersizes


def test_relu_forward():
    params = init_params(0, (6, 5, 3), flag=0, beta=0.5)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 6)),
                    dtype=jnp.float32)
    out_r = np.asarray(forward(params, x, activation="relu"))
    out_s = np.asarray(forward(params, x, activation="sigmoid"))
    assert out_r.shape == out_s.shape
    assert not np.allclose(out_r, out_s)


def test_relu_training_step():
    noisy, clean, starts, params, layersizes = _problem()
    hyper = TrainHyper(beta=2.0, ml=False, bunchsize=8, context=3,
                       targ_offset=1, activation="relu")
    w0 = np.asarray(params[0]["w"]).copy()
    state = make_train_state(params, layersizes[-1])
    out = train_chunk(state, jnp.asarray(noisy), jnp.asarray(clean),
                      jnp.asarray(starts), jnp.float32(0.01), hyper)
    w1 = np.asarray(out.params[0]["w"])
    assert np.isfinite(w1).all()
    assert not np.allclose(w1, w0)


def test_dropout_training_step():
    noisy, clean, starts, params, layersizes = _problem()
    hyper = TrainHyper(beta=1.0, ml=True, bunchsize=8, context=3,
                       targ_offset=1, dropout=(0.1, 0.1))
    state = make_train_state(params, layersizes[-1])
    out = train_chunk(state, jnp.asarray(noisy), jnp.asarray(clean),
                      jnp.asarray(starts), jnp.float32(0.01), hyper,
                      dropout_key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out.params[0]["w"])).all()


def test_postprocess_lps_bounds_suppression():
    rng = np.random.default_rng(0)
    noisy = rng.normal(size=(10, 257)).astype(np.float32) * 2
    enh = noisy - 20.0  # over-suppressed everywhere
    out = postprocess_lps(enh, noisy)
    # Low bins floored at noisy - 2.1, high bins at noisy - 3.43.
    np.testing.assert_allclose(out[:, :37], noisy[:, :37] - 2.1, atol=1e-5)
    np.testing.assert_allclose(out[:, 37:], noisy[:, 37:] - 3.43, atol=1e-5)
    # No-op when enhancement is above the floor.
    np.testing.assert_array_equal(postprocess_lps(noisy, noisy), noisy)


def test_smooth_power_running_min():
    t, d = 30, 5
    power = np.full((t, d), 10.0, dtype=np.float32)
    power[15, 0] = 0.5      # isolated dip below the leading-noise max
    power[14, 0] = 0.4
    out = smooth_power(power)
    # The dip frames take the min over {prev, cur, next} originals.
    assert out[15, 0] == 0.4
    assert out[14, 0] == 0.4
    # Frames above the noise max are untouched.
    assert (out[:, 1:] == 10.0).all()
