"""T5-XXL text encoder, functional JAX with scanned layers.

Behavioural spec: reference python/src/diffusionkit/mlx/t5.py:19-325
(encoder-only: SD3T5Encoder = token embedding + 24 encoder layers + final
RMSNorm; relative-position bias computed once from layer 0's table and shared
as an additive attention mask across layers). The 24 identical layers are
stacked and scanned. The reference's destructive low-memory hacks
(t5.py:233-242) are dropped; T5 parity notes:

- No 1/sqrt(d) attention scaling (T5 convention, reference t5.py:135).
- Softmax in fp32 (reference t5.py:139).
- RMSNorm variant at t5.py:150-159 is algebraically standard RMSNorm.
- Gated FFN: wo(act(wi_0(x)) * wi_1(x)); t5-v1_1 uses gelu.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import T5Config
from ..ops.common import linear
from ..ops.norms import rms_norm

Params = Dict[str, Any]


def relative_position_bucket(
    relative_position: np.ndarray,
    bidirectional: bool = True,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> np.ndarray:
    """HF-compatible bucketing (reference t5.py:19-66), host numpy."""
    relative_buckets = np.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        relative_buckets += (relative_position > 0).astype(np.int32) * num_buckets
        relative_position = np.abs(relative_position)
    else:
        relative_position = -np.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = relative_position < max_exact
    scale = (num_buckets - max_exact) / np.log(max_distance / max_exact)
    rp_large = max_exact + (
        np.log(np.maximum(relative_position, 1).astype(np.float32) / max_exact) * scale
    ).astype(np.int32)
    rp_large = np.minimum(rp_large, num_buckets - 1)
    return relative_buckets + np.where(is_small, relative_position, rp_large)


def relative_position_bias(
    params_embeddings: jnp.ndarray, seq_len: int, config: T5Config
) -> jnp.ndarray:
    """(num_heads, S, S) additive bias (reference t5.py:69-97)."""
    ctx = np.arange(seq_len)[:, None]
    mem = np.arange(seq_len)[None, :]
    buckets = relative_position_bucket(
        mem - ctx,
        bidirectional=True,
        num_buckets=config.relative_attention_num_buckets,
        max_distance=config.relative_attention_max_distance,
    )
    values = params_embeddings[jnp.asarray(buckets)]  # (S, S, H)
    return values.transpose(2, 0, 1)


def _t5_attention(
    lp: Params, x: jnp.ndarray, bias: jnp.ndarray, config: T5Config
) -> jnp.ndarray:
    b, s, _ = x.shape
    nh = config.num_heads

    def heads(t):
        return t.reshape(b, s, nh, -1).transpose(0, 2, 1, 3)

    # q/k/v read the same normed input: quantize it once on the w8a8 path
    # (quantize_t5) instead of once per projection.
    from ..ops.w8a8 import needs_act_quant, quantize_shared

    xq = quantize_shared(x) if needs_act_quant(lp["query_proj"]) else x
    q = heads(linear(lp["query_proj"], xq))
    k = heads(linear(lp["key_proj"], xq))
    v = heads(linear(lp["value_proj"], xq))
    # T5: unscaled dot product + additive position bias, fp32 softmax.
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores + bias.astype(jnp.float32)[None]
    p = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return linear(lp["out_proj"], o.transpose(0, 2, 1, 3).reshape(b, s, -1))


def _t5_layer(lp: Params, x: jnp.ndarray, bias: jnp.ndarray, config: T5Config) -> jnp.ndarray:
    """Pre-RMSNorm layer (reference t5.py:198-215).

    The residual stream stays fp32 (the reference upcasts the attention
    output to fp32 before the residual add, t5.py:210-211); matmul inputs are
    cast to the weight dtype so GEMMs ride the bf16 MXU path.
    """
    wdtype = lp["ln1"]["weight"].dtype
    y = rms_norm(x, lp["ln1"]["weight"], config.layer_norm_epsilon).astype(wdtype)
    x = x + _t5_attention(lp, y, bias, config).astype(jnp.float32)
    y = rms_norm(x, lp["ln2"]["weight"], config.layer_norm_epsilon).astype(wdtype)
    # t5-v1_1 "gated-gelu" is HF's NewGELU (tanh approximation) — verified
    # against transformers.T5EncoderModel in tests/test_hf_parity.py. (The
    # reference uses exact-erf gelu here, t5.py:181 — a fidelity deviation
    # from the checkpoint's training behaviour that we do not reproduce.)
    from ..ops.w8a8 import needs_act_quant, quantize_shared

    yq = quantize_shared(y) if needs_act_quant(lp["wi_0"]) else y
    h = jax.nn.gelu(linear(lp["wi_0"], yq), approximate=True) * linear(lp["wi_1"], yq)
    return x + linear(lp["wo"], h).astype(jnp.float32)


def apply_t5_encoder(
    params: Params, tokens: jnp.ndarray, config: T5Config
) -> jnp.ndarray:
    """(B, S) int32 token ids -> (B, S, d_model) (reference t5.py:316-325)."""
    out_dtype = params["wte"].dtype
    x = params["wte"][tokens].astype(jnp.float32)
    bias = relative_position_bias(
        params["relative_attention_bias"], tokens.shape[1], config
    )

    def body(carry, lp):
        return _t5_layer(lp, carry, bias, config), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = rms_norm(x, params["final_ln"]["weight"], config.layer_norm_epsilon)
    return x.astype(out_dtype)


def init_t5_params(key: jax.Array, config: T5Config, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 8))
    d, dff, inner = config.d_model, config.d_ff, config.d_kv * config.num_heads

    def lin(k, cin, cout):
        return {
            "kernel": (jax.random.normal(k, (cin, cout), jnp.float32) * 0.02).astype(dtype),
            "bias": None,
        }

    def layer(k):
        k1, k2, k3, k4, k5, k6, k7 = jax.random.split(k, 7)
        return {
            "ln1": {"weight": jnp.ones((d,), dtype)},
            "ln2": {"weight": jnp.ones((d,), dtype)},
            "query_proj": lin(k1, d, inner),
            "key_proj": lin(k2, d, inner),
            "value_proj": lin(k3, d, inner),
            "out_proj": lin(k4, inner, d),
            "wi_0": lin(k5, d, dff),
            "wi_1": lin(k6, d, dff),
            "wo": lin(k7, dff, d),
        }

    layer_keys = jax.random.split(next(ks), config.num_layers)
    layers = [layer(k) for k in layer_keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)
    return {
        "wte": (
            jax.random.normal(next(ks), (config.vocab_size, d), jnp.float32) * 0.02
        ).astype(dtype),
        "relative_attention_bias": (
            jax.random.normal(
                next(ks), (config.relative_attention_num_buckets, config.num_heads), jnp.float32
            )
            * 0.02
        ).astype(dtype),
        "layers": stacked,
        "final_ln": {"weight": jnp.ones((d,), dtype)},
    }
