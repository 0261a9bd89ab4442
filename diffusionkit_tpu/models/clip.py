"""CLIP text encoder (L/14 and bigG/14), functional JAX.

Behavioural spec: reference python/src/diffusionkit/mlx/clip.py:14-120.
Returns pooled output (EOS-argmax token, optionally projected), the final
hidden state, and all per-layer hidden states — SD3 consumes the penultimate
hidden state (reference mlx/__init__.py:217).

Per-depth layer weights are STACKED and the layer loop is one ``lax.scan``
(the package-wide convention, cf. models/mmdit.py): one compiled layer body
for bigG's 32 layers instead of 32 unrolled copies — flat trace/compile time
and a single sharding decision per weight. The scan's stacked ys provide the
per-layer hidden states the reference exposes as a Python list.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple

import jax
import jax.numpy as jnp

from ..config import CLIPTextModelConfig
from ..ops.common import linear
from ..ops.norms import layer_norm_affine

Params = Dict[str, Any]


class CLIPOutput(NamedTuple):
    pooled_output: jnp.ndarray
    last_hidden_state: jnp.ndarray
    hidden_states: List[jnp.ndarray]


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_ACTIVATIONS = {
    "quick_gelu": _quick_gelu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
}


def _attn(lp: Params, x: jnp.ndarray, mask: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, c = x.shape
    d = c // num_heads

    def heads(t):
        return t.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)

    q = heads(linear(lp["query_proj"], x))
    k = heads(linear(lp["key_proj"], x))
    v = heads(linear(lp["value_proj"], x))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / jnp.sqrt(jnp.float32(d))) + mask.astype(jnp.float32)
    p = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return linear(lp["out_proj"], o.transpose(0, 2, 1, 3).reshape(b, s, c))


def _encoder_layer(
    lp: Params, x: jnp.ndarray, mask: jnp.ndarray, config: CLIPTextModelConfig
) -> jnp.ndarray:
    """Pre-LN transformer layer (reference clip.py:27-59)."""
    act = _ACTIVATIONS[config.hidden_act]
    y = layer_norm_affine(x, lp["ln1"]["weight"], lp["ln1"]["bias"], eps=1e-5)
    x = x + _attn(lp, y, mask, config.num_heads)
    y = layer_norm_affine(x, lp["ln2"]["weight"], lp["ln2"]["bias"], eps=1e-5)
    return x + linear(lp["linear2"], act(linear(lp["linear1"], y)))


def apply_clip(
    params: Params, tokens: jnp.ndarray, config: CLIPTextModelConfig
) -> CLIPOutput:
    """Forward over int32 token ids (B, N) (reference clip.py:91-120)."""
    b, n = tokens.shape
    eos_positions = jnp.argmax(tokens, axis=-1)

    x = params["token_embedding"][tokens]
    x = x + params["position_embedding"][:n]

    # Causal mask; large-negative finite for low-precision dtypes
    # (reference clip.py:83-89).
    neg = -6e4 if x.dtype in (jnp.float16, jnp.bfloat16) else -1e9
    idx = jnp.arange(n)
    mask = jnp.where(idx[:, None] < idx[None, :], neg, 0.0).astype(jnp.float32)

    def body(h, lp):
        h = _encoder_layer(lp, h, mask, config)
        return h, h

    x, ys = jax.lax.scan(body, x, params["layers"])
    hidden_states = [ys[i] for i in range(config.num_layers)]

    x = layer_norm_affine(
        x, params["final_layer_norm"]["weight"], params["final_layer_norm"]["bias"], eps=1e-5
    )
    pooled = x[jnp.arange(b), eos_positions]
    if "text_projection" in params:
        pooled = linear(params["text_projection"], pooled)
    return CLIPOutput(pooled, x, hidden_states)


def init_clip_params(
    key: jax.Array, config: CLIPTextModelConfig, dtype=jnp.float32
) -> Params:
    ks = iter(jax.random.split(key, 4 + config.num_layers))
    d = config.model_dims

    def lin(k, cin, cout, bias=True):
        p = {"kernel": (jax.random.normal(k, (cin, cout), jnp.float32) * 0.02).astype(dtype)}
        p["bias"] = jnp.zeros((cout,), dtype) if bias else None
        return p

    def norm():
        return {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    p: Params = {
        "token_embedding": (
            jax.random.normal(next(ks), (config.vocab_size, d), jnp.float32) * 0.02
        ).astype(dtype),
        "position_embedding": (
            jax.random.normal(next(ks), (config.max_length, d), jnp.float32) * 0.02
        ).astype(dtype),
        "final_layer_norm": norm(),
    }
    layers = []
    for _ in range(config.num_layers):
        k = next(ks)
        k1, k2, k3, k4, k5, k6 = jax.random.split(k, 6)
        layers.append(
            {
                "ln1": norm(),
                "ln2": norm(),
                "query_proj": lin(k1, d, d),
                "key_proj": lin(k2, d, d),
                "value_proj": lin(k3, d, d),
                "out_proj": lin(k4, d, d),
                "linear1": lin(k5, d, 4 * d),
                "linear2": lin(k6, 4 * d, d),
            }
        )
    p["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    if config.projection_dim is not None:
        p["text_projection"] = lin(next(ks), d, config.projection_dim, bias=False)
    return p
