"""SmoothQuant T5 folding (ops/smoothquant.py): exactness + outlier payoff.

VERDICT round 3, Weak #3: quantize_t5's quality was proven only on
outlier-free synthetic weights. These tests pin (a) the fold is an exact
float-level equivalence (all four fold directions), and (b) on a T5 with
injected heavy-tailed outlier channels, the smoothed w8a8 model tracks the
float model strictly better than the unsmoothed w8a8 model.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionkit_tpu.config import T5Config
from diffusionkit_tpu.models import apply_t5_encoder, init_t5_params
from diffusionkit_tpu.ops.smoothquant import (
    smoothquant_fold_t5_host,
    t5_calibration_stats_host,
)

CFG = T5Config(
    vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=3, num_heads=4
)


def _host_tree(params):
    return jax.tree.map(lambda a: np.asarray(a), params)


def _tokens(b=2, s=12, seed=0):
    return np.random.RandomState(seed).randint(1, CFG.vocab_size, (b, s)).astype(np.int32)


def _inject_outliers(params, channels=(3, 17), factor=100.0):
    """Create persistent residual-stream outlier channels: scale the
    embedding and every layer's wo output columns for those channels."""
    p = jax.tree.map(np.array, params)  # deep copy
    for ch in channels:
        p["wte"][:, ch] *= factor
        p["layers"]["wo"]["kernel"][:, :, ch] *= factor
    return p


def test_fold_is_float_equivalent():
    params = _host_tree(init_t5_params(jax.random.PRNGKey(0), CFG, jnp.float32))
    tokens = _tokens()
    stats = t5_calibration_stats_host(params, tokens, CFG)
    assert len(stats) == CFG.num_layers
    for st in stats:
        assert st["qkv"].shape == (CFG.d_model,)
        assert st["o"].shape == (CFG.d_kv * CFG.num_heads,)
        assert st["wo"].shape == (CFG.d_ff,)
        for v in st.values():
            assert np.isfinite(v).all() and (v > 0).any()
    folded = smoothquant_fold_t5_host(params, stats, alpha=0.5)

    want = np.asarray(apply_t5_encoder(params, jnp.asarray(tokens), CFG))
    got = np.asarray(apply_t5_encoder(folded, jnp.asarray(tokens), CFG))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
    # and the fold actually moved something
    assert not np.allclose(
        np.asarray(folded["layers"]["ln1"]["weight"]),
        np.asarray(params["layers"]["ln1"]["weight"]),
    )


def test_smoothing_beats_plain_w8a8_on_outliers():
    from diffusionkit_tpu.ops.w8a8 import w8a8_tree

    params = _inject_outliers(
        _host_tree(init_t5_params(jax.random.PRNGKey(1), CFG, jnp.float32))
    )
    tokens = _tokens(seed=3)
    want = np.asarray(apply_t5_encoder(params, jnp.asarray(tokens), CFG))

    plain = np.asarray(
        apply_t5_encoder(w8a8_tree(params, min_size=1), jnp.asarray(tokens), CFG)
    )
    stats = t5_calibration_stats_host(params, _tokens(seed=4), CFG)
    smoothed_tree = w8a8_tree(
        smoothquant_fold_t5_host(params, stats, alpha=0.5), min_size=1
    )
    smooth = np.asarray(apply_t5_encoder(smoothed_tree, jnp.asarray(tokens), CFG))

    err_plain = float(np.abs(plain - want).mean())
    err_smooth = float(np.abs(smooth - want).mean())
    # Outlier channels dominate the per-token scales without smoothing.
    assert err_smooth < 0.7 * err_plain, (err_smooth, err_plain)


def test_smooth_t5_end_to_end_without_tokenizer():
    """smooth_t5's no-tokenizer fallback path produces a working tree."""
    from diffusionkit_tpu.ops.smoothquant import smooth_t5

    params = _host_tree(init_t5_params(jax.random.PRNGKey(2), CFG, jnp.float32))
    folded = smooth_t5(params, CFG, tokenizer=None)
    tokens = _tokens(seed=5)
    want = np.asarray(apply_t5_encoder(params, jnp.asarray(tokens), CFG))
    got = np.asarray(apply_t5_encoder(folded, jnp.asarray(tokens), CFG))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
