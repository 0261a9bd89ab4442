"""Profile the jitted SD3/FLUX CFG denoise step on the TPU and print an
HLO-level time breakdown.

Captures a jax.profiler trace around a chained-step run (the verify-skill
timing recipe), then converts the xplane.pb with xprof's native converter to
the hlo_stats table and aggregates self-time by op category — the data the
round-2 perf push needs: is the step matmul-bound, and where do the
non-matmul milliseconds go?

Usage:  python tools/profile_step.py [sd3|flux-int4] [out.json]
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_STEPS = 8


def build_step(mode: str):
    from diffusionkit_tpu.config import FLUX_SCHNELL, SD3_2b
    from diffusionkit_tpu.models import init_mmdit_params
    from diffusionkit_tpu.pipeline import _denoise_step

    if mode == "tiny":
        # plumbing validation (CPU-friendly)
        from diffusionkit_tpu.config import MMDiTConfig

        config = MMDiTConfig(
            depth_multimodal=2, hidden_size_override=64, num_heads=4,
            max_latent_resolution=16, token_level_text_embed_dim=32,
            pooled_text_embed_dim=48, dtype=jnp.float32,
        )
        params = init_mmdit_params(jax.random.PRNGKey(0), config)
        latent = jnp.zeros((1, 8, 8, 16), jnp.float32)
        cond = jnp.zeros((2, 10, 32), config.dtype)
        pooled = jnp.zeros((2, 48), config.dtype)
        cfg, cfg_on = 5.0, True
    elif mode == "vae-decode":
        # 1024^2 decode: where does the non-roofline time go? (convs vs
        # GroupNorm vs mid attention). Chained via a latent derived from the
        # previous uint8 output so steps can't be elided.
        from diffusionkit_tpu.config import VAEDecoderConfig
        from diffusionkit_tpu.models import init_vae_decoder_params
        from diffusionkit_tpu.pipeline import _decode_u8_step

        config = VAEDecoderConfig()
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            init_vae_decoder_params(jax.random.PRNGKey(0), config),
        )
        latent0 = jnp.asarray(
            np.random.RandomState(0).randn(1, 128, 128, 16), jnp.float32
        )
        jax.block_until_ready(params)

        @jax.jit
        def _reseed(img, latent):
            # cheap image->latent feedback: mean-pool 8x8 patches to 16ch
            x = img[:, ::8, ::8, :1].astype(jnp.float32)
            return latent + 0.001 * jnp.broadcast_to(x, latent.shape)

        def step(latent, i):
            img = _decode_u8_step(params, latent, config, dtype=jnp.bfloat16)
            return _reseed(img, latent)

        return step, latent0
    elif mode == "sd35-w4a8":
        # SD3.5-large 1024^2 CFG in the serving quant mode — the bench's 47%
        # MFU outlier (FLUX w4a8 reaches 84%); the HLO category split says
        # whether the gap is GEMM efficiency (small-M txt-branch matmuls) or
        # unfused elementwise.
        from diffusionkit_tpu.config import SD3_8b
        from diffusionkit_tpu.ops.w4a8_matmul import add_wscale_bound_tree

        config = SD3_8b
        params = add_wscale_bound_tree(
            init_mmdit_params(jax.random.PRNGKey(0), config, quantize_bits=4)
        )
        latent = jnp.asarray(np.random.RandomState(0).randn(1, 128, 128, 16), jnp.float32)
        cond = jnp.zeros((2, 154, 4096), config.dtype)
        pooled = jnp.zeros((2, 2048), config.dtype)
        cfg, cfg_on = 5.0, True
    elif mode in ("flux-int4", "flux-w4a8"):
        config = FLUX_SCHNELL
        params = init_mmdit_params(jax.random.PRNGKey(0), config, quantize_bits=4)
        if mode == "flux-w4a8":
            from diffusionkit_tpu.ops.w4a8_matmul import add_wscale_bound_tree

            params = add_wscale_bound_tree(params)
        latent = jnp.asarray(np.random.RandomState(0).randn(1, 128, 128, 16), jnp.float32)
        cond = jnp.zeros((1, 256, 4096), config.dtype)
        pooled = jnp.zeros((1, 768), config.dtype)
        cfg, cfg_on = 0.0, False
    else:
        config = SD3_2b
        params = init_mmdit_params(jax.random.PRNGKey(0), config)
        latent = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 16), jnp.float32)
        cond = jnp.zeros((2, 154, 4096), config.dtype)
        pooled = jnp.zeros((2, 2048), config.dtype)
        cfg, cfg_on = 5.0, True
    jax.block_until_ready(params)
    sigmas = np.linspace(1.0, 0.0, N_STEPS + 2).astype(np.float32)

    def step(x, i):
        return _denoise_step(
            params, x,
            jnp.asarray(sigmas[i], jnp.float32), jnp.asarray(sigmas[i + 1], jnp.float32),
            cond, pooled, jnp.asarray(cfg, jnp.float32), None, config, cfg_on, None,
        )

    return step, latent


def hlo_breakdown(logdir: str):
    from xprof.convert import raw_to_tool_data

    paths = sorted(glob.glob(os.path.join(logdir, "plugins/profile/*/")))
    if not paths:
        raise SystemExit(f"no profile dirs under {logdir}")
    sess = paths[-1]
    xplanes = glob.glob(os.path.join(sess, "*.xplane.pb"))
    for tool in ("hlo_stats", "framework_op_stats"):
        data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, tool, {})
        if isinstance(data, bytes):
            data = data.decode("utf-8", "replace")
        parsed = json.loads(data)
        tables = parsed if isinstance(parsed, list) else [parsed]
        for t in tables:
            if isinstance(t, dict) and t.get("rows"):
                return t
    raise SystemExit("no populated stats table in the trace")


def aggregate(table):
    """hlo_stats arrives as gviz JSON: {cols: [...], rows: [{c: [{v:..}]}]}."""
    cols = [c.get("label") or c.get("id") for c in table["cols"]]

    def idx(*names):
        for n in names:
            if n in cols:
                return cols.index(n)
        return None

    i_cat = idx("HLO op category", "category", "Operation Type")
    i_self = idx(
        "Total self time (us)", "total_self_time_us", "Total self-time (us)",
        "Avg. self time (us)", "Total time (us)",
    )
    i_name = idx("HLO op expression", "HLO op name", "hlo_op_name", "Operation Name")
    i_occ = idx("#Occurrences", "occurrences")
    i_dev = idx("Host/device")
    by_cat, top_ops = {}, []
    for row in table["rows"]:
        c = row["c"]
        if i_dev is not None and str(c[i_dev]["v"]).lower() == "host":
            continue
        cat = c[i_cat]["v"] if i_cat is not None else "?"
        self_us = float(c[i_self]["v"] or 0) if i_self is not None else 0.0
        by_cat[cat] = by_cat.get(cat, 0.0) + self_us
        top_ops.append(
            {
                "cat": cat,
                "self_us": self_us,
                "occ": (c[i_occ]["v"] if i_occ is not None else None),
                "op": (str(c[i_name]["v"])[:160] if i_name is not None else "?"),
            }
        )
    top_ops.sort(key=lambda r: -r["self_us"])
    return by_cat, top_ops[:25], cols


def dump_fusion_bodies(top_ops, out_txt):
    """Write the optimized-HLO computation bodies for the profile's top
    non-custom-call ops, so 'fusion.104' becomes attributable to actual
    model math (modulate chain, residual cast, quantize, ...).

    Reads the after-optimizations HLO text that XLA dumped during THIS
    process's compile (main() sets --xla_dump_to; re-lowering here would
    capture the 7.5 GB param tree as module constants)."""
    import re

    dumps = sorted(
        glob.glob("/tmp/xla_dump_profile/*after_optimizations*.txt"),
        key=os.path.getsize,
    )
    if not dumps:
        with open(out_txt, "w") as f:
            f.write("no xla dump found\n")
        return
    hlo = open(dumps[-1]).read()  # largest = the step module
    names = [
        o["op"].split(" ")[0] for o in top_ops
        if o["cat"] not in ("custom-call",)
    ][:14]
    # Custom-call instruction lines too: their operand shapes attribute each
    # w4a8_matmul.N / flash call to a concrete GEMM (dual img vs txt vs
    # unified, M/K/N) without guessing from occurrence counts.
    names += [
        o["op"].split(" ")[0] for o in top_ops if o["cat"] == "custom-call"
    ][:14]
    with open(out_txt, "w") as f:
        for name in names:
            # The instruction line (inside some computation) names its fused
            # computation; grab both.
            m = re.search(rf"%?{re.escape(name)} = .*", hlo)
            if not m:
                f.write(f"== {name}: NOT FOUND\n\n")
                continue
            line = m.group(0)
            f.write(f"== {name}\n{line[:400]}\n")
            cm = re.search(r"calls=([%\w.\-]+)", line)
            if cm:
                body = re.search(
                    rf"(%?{re.escape(cm.group(1).lstrip('%'))} .*?\n)(.*?)\n\}}",
                    hlo, re.S,
                )
                if body:
                    f.write(body.group(2)[:4000] + "\n")
            f.write("\n")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "sd3"
    out_path = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/profile_{mode}.json"
    logdir = f"/tmp/jaxprof_{mode}"
    # For the fusion-body dump, the CALLER must set (before python starts —
    # the axon hook initialises the backend at interpreter startup):
    #   XLA_FLAGS="--xla_dump_to=/tmp/xla_dump_profile --xla_dump_hlo_pass_re=^$"
    step, x0 = build_step(mode)

    # compile + settle
    x = step(x0, 0)
    _ = np.asarray(x)
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        for i in range(N_STEPS):
            x = step(x, 1 + i)
        _ = np.asarray(x)
    wall_ms = (time.perf_counter() - t0) / N_STEPS * 1000

    by_cat, top, cols = aggregate(hlo_breakdown(logdir))
    total_us = sum(by_cat.values())
    report = {
        "mode": mode,
        "wall_ms_per_step": round(wall_ms, 2),
        "device_total_ms_per_step": round(total_us / 1e3 / N_STEPS, 2),
        "by_category_ms_per_step": {
            k: round(v / 1e3 / N_STEPS, 3)
            for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])
        },
        "top_ops_us_total": top,
        "cols": cols,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    try:
        dump_fusion_bodies(top, out_path.replace(".json", "_fusions.txt"))
    except Exception as e:  # best-effort diagnostic
        print("fusion dump failed:", e)
    print(json.dumps({k: report[k] for k in
                      ("mode", "wall_ms_per_step", "device_total_ms_per_step",
                       "by_category_ms_per_step")}, indent=1))
    print("full report:", out_path)


if __name__ == "__main__":
    main()
