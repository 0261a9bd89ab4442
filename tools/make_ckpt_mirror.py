"""Generate full-size synthetic checkpoint mirrors for ALL SIX registry
models, in the exact raw file layouts the real checkpoints use:

- SD3-medium / SD3.5-large: sgm namespace (model.diffusion_model.joint_blocks,
  first_stage_model VAE), fp16.
- FLUX.1-schnell / FLUX.1-dev: BFL namespace (double_blocks/single_blocks),
  bf16, separate ae.safetensors VAE.
- *-4bit-quantized: the PRE-ADJUSTED MLX module namespace with nn.quantize
  storage (uint32 packed weight + fp16 scales/biases per group of 64) that
  the real 4-bit files ship in (reference model_io.py:726-734,764-776).
- aux repo: CLIP L/G (HF namespace), synthetic CLIP tokenizers, T5-XXL
  encoder (HF namespace) and a fabricated fast T5 tokenizer
  (google/t5-v1_1-xxl with tokenizer.json — no sentencepiece needed).

Usage: python tools/make_ckpt_mirror.py [--only sd3_medium,flux_schnell,...]
Skips files that already exist. Total ~80 GB.
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent / ".ckpt_mirror"
rs = np.random.RandomState(0)
BASE = rs.randn(1 << 20).astype(np.float16) * 0.02
BASE_U32 = rs.randint(0, 2**31 - 1, size=1 << 18).astype(np.uint32) * np.uint32(2) + np.uint32(rs.randint(0, 2))
GROUP = 64


def W(*shape):
    n = int(np.prod(shape))
    return np.resize(BASE, n).reshape(shape)


def U32(*shape):
    n = int(np.prod(shape))
    return np.resize(BASE_U32, n).reshape(shape)


def _save(sd, path: Path):
    from safetensors.numpy import save_file

    path.parent.mkdir(parents=True, exist_ok=True)
    save_file(sd, str(path))
    gb = sum(v.nbytes for v in sd.values()) / 1e9
    print(f"{path.relative_to(ROOT)}: {len(sd)} tensors, {gb:.1f} GB")


# ---------------------------------------------------------------------------
# SD3 family — raw sgm namespace
# ---------------------------------------------------------------------------


def sd3_mmdit_sgm(H, depth, qk_norm=False, pos_tokens=36864):
    sd = {}
    pfx = "model.diffusion_model."
    for i in range(depth):
        last = i == depth - 1
        for blk in ("x_block", "context_block"):
            b = f"{pfx}joint_blocks.{i}.{blk}"
            sd[f"{b}.attn.qkv.weight"] = W(3 * H, H)
            sd[f"{b}.attn.qkv.bias"] = W(3 * H)
            if qk_norm:
                hd = 64  # SD3 head_dim is always 64
                sd[f"{b}.attn.ln_q.weight"] = W(hd) + 1
                sd[f"{b}.attn.ln_k.weight"] = W(hd) + 1
            skip = last and blk == "context_block"
            nm = 2 if skip else 6
            sd[f"{b}.adaLN_modulation.1.weight"] = W(nm * H, H)
            sd[f"{b}.adaLN_modulation.1.bias"] = W(nm * H)
            if not skip:
                sd[f"{b}.attn.proj.weight"] = W(H, H)
                sd[f"{b}.attn.proj.bias"] = W(H)
                sd[f"{b}.mlp.fc1.weight"] = W(4 * H, H)
                sd[f"{b}.mlp.fc1.bias"] = W(4 * H)
                sd[f"{b}.mlp.fc2.weight"] = W(H, 4 * H)
                sd[f"{b}.mlp.fc2.bias"] = W(H)
    sd[pfx + "x_embedder.proj.weight"] = W(H, 16, 2, 2)
    sd[pfx + "x_embedder.proj.bias"] = W(H)
    sd[pfx + "pos_embed"] = W(1, pos_tokens, H)
    sd[pfx + "context_embedder.weight"] = W(H, 4096)
    sd[pfx + "context_embedder.bias"] = W(H)
    for name, din in (("t_embedder", 256), ("y_embedder", 2048)):
        sd[f"{pfx}{name}.mlp.0.weight"] = W(H, din)
        sd[f"{pfx}{name}.mlp.0.bias"] = W(H)
        sd[f"{pfx}{name}.mlp.2.weight"] = W(H, H)
        sd[f"{pfx}{name}.mlp.2.bias"] = W(H)
    sd[pfx + "final_layer.adaLN_modulation.1.weight"] = W(2 * H, H)
    sd[pfx + "final_layer.adaLN_modulation.1.bias"] = W(2 * H)
    sd[pfx + "final_layer.linear.weight"] = W(64, H)
    sd[pfx + "final_layer.linear.bias"] = W(64)
    return sd


def vae(prefix, ch, layers, in_ch, out_ch, down):
    d = {}
    first = ch[0] if down else ch[-1]
    d[prefix + "conv_in.weight"] = W(first, in_ch, 3, 3)
    d[prefix + "conv_in.bias"] = W(first)
    mid = ch[-1]
    for blk in ("block_1", "block_2"):
        for n in ("norm1", "norm2"):
            d[f"{prefix}mid.{blk}.{n}.weight"] = W(mid) + 1
            d[f"{prefix}mid.{blk}.{n}.bias"] = W(mid)
        d[f"{prefix}mid.{blk}.conv1.weight"] = W(mid, mid, 3, 3)
        d[f"{prefix}mid.{blk}.conv1.bias"] = W(mid)
        d[f"{prefix}mid.{blk}.conv2.weight"] = W(mid, mid, 3, 3)
        d[f"{prefix}mid.{blk}.conv2.bias"] = W(mid)
    d[prefix + "mid.attn_1.norm.weight"] = W(mid) + 1
    d[prefix + "mid.attn_1.norm.bias"] = W(mid)
    for n in ("q", "k", "v", "proj_out"):
        d[f"{prefix}mid.attn_1.{n}.weight"] = W(mid, mid, 1, 1)
        d[f"{prefix}mid.attn_1.{n}.bias"] = W(mid)
    if down:
        seq = list(zip([ch[0]] + list(ch), ch))
        word = "down"
    else:
        rev = list(reversed(ch))
        seq = list(zip([rev[0]] + rev, rev))
        word = "up"
    for i, (cin, cout) in enumerate(seq[: len(ch)]):
        idx = i if down else len(ch) - 1 - i
        for j in range(layers):
            cin_j = cin if j == 0 else cout
            b = f"{prefix}{word}.{idx}.block.{j}"
            d[f"{b}.norm1.weight"] = W(cin_j) + 1
            d[f"{b}.norm1.bias"] = W(cin_j)
            d[f"{b}.conv1.weight"] = W(cout, cin_j, 3, 3)
            d[f"{b}.conv1.bias"] = W(cout)
            d[f"{b}.norm2.weight"] = W(cout) + 1
            d[f"{b}.norm2.bias"] = W(cout)
            d[f"{b}.conv2.weight"] = W(cout, cout, 3, 3)
            d[f"{b}.conv2.bias"] = W(cout)
            if cin_j != cout:
                d[f"{b}.nin_shortcut.weight"] = W(cout, cin_j, 1, 1)
                d[f"{b}.nin_shortcut.bias"] = W(cout)
        if i < len(ch) - 1:
            if down:
                d[f"{prefix}down.{idx}.downsample.conv.weight"] = W(cout, cout, 3, 3)
                d[f"{prefix}down.{idx}.downsample.conv.bias"] = W(cout)
            else:
                d[f"{prefix}up.{idx}.upsample.conv.weight"] = W(cout, cout, 3, 3)
                d[f"{prefix}up.{idx}.upsample.conv.bias"] = W(cout)
    lastc = ch[0] if not down else ch[-1]
    d[prefix + "norm_out.weight"] = W(lastc) + 1
    d[prefix + "norm_out.bias"] = W(lastc)
    d[prefix + "conv_out.weight"] = W(out_ch, lastc, 3, 3)
    d[prefix + "conv_out.bias"] = W(out_ch)
    return d


CH = (128, 256, 512, 512)


def sgm_vae():
    d = {}
    d.update(vae("first_stage_model.decoder.", CH, 3, 16, 3, down=False))
    d.update(vae("first_stage_model.encoder.", CH, 2, 3, 32, down=True))
    return d


# ---------------------------------------------------------------------------
# FLUX family — raw BFL namespace
# ---------------------------------------------------------------------------


def flux_bfl(H=3072, mm=19, uni=38, mlp=4, guidance=False):
    hd = 128
    sd = {}
    for i in range(mm):
        for tag in ("img", "txt"):
            b = f"double_blocks.{i}.{tag}"
            sd[f"{b}_attn.qkv.weight"] = W(3 * H, H)
            sd[f"{b}_attn.qkv.bias"] = W(3 * H)
            sd[f"{b}_attn.norm.query_norm.scale"] = W(hd) + 1
            sd[f"{b}_attn.norm.key_norm.scale"] = W(hd) + 1
            sd[f"{b}_attn.proj.weight"] = W(H, H)
            sd[f"{b}_attn.proj.bias"] = W(H)
            sd[f"{b}_mlp.0.weight"] = W(mlp * H, H)
            sd[f"{b}_mlp.0.bias"] = W(mlp * H)
            sd[f"{b}_mlp.2.weight"] = W(H, mlp * H)
            sd[f"{b}_mlp.2.bias"] = W(H)
            sd[f"{b}_mod.lin.weight"] = W(6 * H, H)
            sd[f"{b}_mod.lin.bias"] = W(6 * H)
    for i in range(uni):
        b = f"single_blocks.{i}"
        sd[f"{b}.linear1.weight"] = W((3 + mlp) * H, H)
        sd[f"{b}.linear1.bias"] = W((3 + mlp) * H)
        sd[f"{b}.linear2.weight"] = W(H, (1 + mlp) * H)
        sd[f"{b}.linear2.bias"] = W(H)
        sd[f"{b}.norm.query_norm.scale"] = W(hd) + 1
        sd[f"{b}.norm.key_norm.scale"] = W(hd) + 1
        sd[f"{b}.modulation.lin.weight"] = W(3 * H, H)
        sd[f"{b}.modulation.lin.bias"] = W(3 * H)
    sd["img_in.weight"] = W(H, 64)
    sd["img_in.bias"] = W(H)
    sd["txt_in.weight"] = W(H, 4096)
    sd["txt_in.bias"] = W(H)
    for name, din in (("time_in", 256), ("vector_in", 768)):
        sd[f"{name}.in_layer.weight"] = W(H, din)
        sd[f"{name}.in_layer.bias"] = W(H)
        sd[f"{name}.out_layer.weight"] = W(H, H)
        sd[f"{name}.out_layer.bias"] = W(H)
    if guidance:
        sd["guidance_in.in_layer.weight"] = W(H, 256)
        sd["guidance_in.in_layer.bias"] = W(H)
        sd["guidance_in.out_layer.weight"] = W(H, H)
        sd["guidance_in.out_layer.bias"] = W(H)
    sd["final_layer.adaLN_modulation.1.weight"] = W(2 * H, H)
    sd["final_layer.adaLN_modulation.1.bias"] = W(2 * H)
    sd["final_layer.linear.weight"] = W(64, H)
    sd["final_layer.linear.bias"] = W(64)
    return sd


def bfl_ae():
    d = {}
    d.update(vae("decoder.", CH, 3, 16, 3, down=False))
    d.update(vae("encoder.", CH, 2, 3, 32, down=True))
    return d


# ---------------------------------------------------------------------------
# 4-bit files — MLX module namespace, nn.quantize storage
# ---------------------------------------------------------------------------


def qlin(sd, key, out_d, in_d, bias=True):
    """Random MLX QuantizedLinear storage: weight (out,in/8) uint32 +
    fp16 scales/biases per group of 64 along the input axis."""
    sd[key + ".weight"] = U32(out_d, in_d // 8)
    sd[key + ".scales"] = (np.abs(W(out_d, in_d // GROUP)) / 8 + 1e-4).astype(np.float16)
    sd[key + ".biases"] = (W(out_d, in_d // GROUP) / 2).astype(np.float16)
    if bias:
        sd[key + ".bias"] = W(out_d)


def mlx_block(sd, pre, H, hd, mlp=4, n_mod=6, post=True, shared_bias=True, k_bias=True):
    qlin(sd, f"{pre}.attn.q_proj", H, H)
    qlin(sd, f"{pre}.attn.k_proj", H, H, bias=k_bias)
    qlin(sd, f"{pre}.attn.v_proj", H, H)
    qlin(sd, f"{pre}.adaLN_modulation.layers.1", n_mod * H, H)
    if post:
        qlin(sd, f"{pre}.attn.o_proj", H, H)
        qlin(sd, f"{pre}.mlp.fc1", mlp * H, H)
        qlin(sd, f"{pre}.mlp.fc2", H, mlp * H, bias=False)
        if shared_bias:
            # FLUX single blocks duplicate the shared linear2 bias onto fc2
            sd[f"{pre}.mlp.fc2.bias"] = sd[f"{pre}.attn.o_proj.bias"]
        else:
            sd[f"{pre}.mlp.fc2.bias"] = W(H)
    sd[f"{pre}.qk_norm.q_norm.weight"] = W(hd) + 1
    sd[f"{pre}.qk_norm.k_norm.weight"] = W(hd) + 1


def flux_4bit(H=3072, mm=19, uni=38):
    hd = 128
    sd = {}
    for i in range(mm):
        for tag in ("image", "text"):
            mlx_block(sd, f"multimodal_transformer_blocks.{i}.{tag}_transformer_block",
                      H, hd, shared_bias=False)
    for i in range(uni):
        mlx_block(sd, f"unified_transformer_blocks.{i}.transformer_block",
                  H, hd, n_mod=3, shared_bias=True)
    sd["x_embedder.proj.weight"] = W(H, 1, 1, 64)  # MLX conv OHWI, float
    sd["x_embedder.proj.bias"] = W(H)
    qlin(sd, "context_embedder", H, 4096)
    qlin(sd, "t_embedder.mlp.layers.0", H, 256)
    qlin(sd, "t_embedder.mlp.layers.2", H, H)
    qlin(sd, "y_embedder.mlp.layers.0", H, 768)
    qlin(sd, "y_embedder.mlp.layers.2", H, H)
    qlin(sd, "final_layer.adaLN_modulation.layers.1", 2 * H, H)
    qlin(sd, "final_layer.linear", 64, H)
    return sd


def sd35_4bit(H=2432, depth=38):
    hd = 64
    sd = {}
    pfx = "model.diffusion_model."
    for i in range(depth):
        for tag in ("image", "text"):
            last_txt = tag == "text" and i == depth - 1
            mlx_block(
                sd, f"{pfx}multimodal_transformer_blocks.{i}.{tag}_transformer_block",
                H, hd, n_mod=2 if last_txt else 6, post=not last_txt,
                shared_bias=False, k_bias=False,  # sgm adjustment drops k bias
            )
    sd[pfx + "x_embedder.proj.weight"] = W(H, 2, 2, 16)  # OHWI
    sd[pfx + "x_embedder.proj.bias"] = W(H)
    sd[pfx + "x_pos_embedder.pos_embed.weight"] = W(36864, H)
    qlin(sd, pfx + "context_embedder", H, 4096)
    qlin(sd, pfx + "t_embedder.mlp.layers.0", H, 256)
    qlin(sd, pfx + "t_embedder.mlp.layers.2", H, H)
    qlin(sd, pfx + "y_embedder.mlp.layers.0", H, 2048)
    qlin(sd, pfx + "y_embedder.mlp.layers.2", H, H)
    qlin(sd, pfx + "final_layer.adaLN_modulation.layers.1", 2 * H, H)
    qlin(sd, pfx + "final_layer.linear", 64, H)
    sd.update(sgm_vae())  # 4-bit file also carries the fp VAE
    return sd


# ---------------------------------------------------------------------------
# Aux repo: CLIP, tokenizers, T5
# ---------------------------------------------------------------------------


def clip_and_tokenizers(aux: Path):
    from safetensors.numpy import save_file

    for which, layers, dim, heads, proj in (
        ("clip_l", 12, 768, 12, None), ("clip_g", 32, 1280, 20, 1280)
    ):
        if (aux / which / "model.fp16.safetensors").exists():
            continue
        d = {}
        d["text_model.embeddings.token_embedding.weight"] = W(49408, dim)
        d["text_model.embeddings.position_embedding.weight"] = W(77, dim)
        d["text_model.final_layer_norm.weight"] = W(dim) + 1
        d["text_model.final_layer_norm.bias"] = W(dim)
        for i in range(layers):
            pre = f"text_model.encoder.layers.{i}"
            for ln in ("layer_norm1", "layer_norm2"):
                d[f"{pre}.{ln}.weight"] = W(dim) + 1
                d[f"{pre}.{ln}.bias"] = W(dim)
            for pn in ("q_proj", "k_proj", "v_proj", "out_proj"):
                d[f"{pre}.self_attn.{pn}.weight"] = W(dim, dim)
                d[f"{pre}.self_attn.{pn}.bias"] = W(dim)
            d[f"{pre}.mlp.fc1.weight"] = W(4 * dim, dim)
            d[f"{pre}.mlp.fc1.bias"] = W(4 * dim)
            d[f"{pre}.mlp.fc2.weight"] = W(dim, 4 * dim)
            d[f"{pre}.mlp.fc2.bias"] = W(dim)
        if proj:
            d["text_projection.weight"] = W(proj, dim)
        (aux / which).mkdir(parents=True, exist_ok=True)
        save_file(d, str(aux / which / "model.fp16.safetensors"))
        cfg = {"num_hidden_layers": layers, "hidden_size": dim,
               "num_attention_heads": heads, "max_position_embeddings": 77,
               "vocab_size": 49408, "projection_dim": proj,
               "hidden_act": "gelu" if proj else "quick_gelu"}
        with open(aux / which / "config.json", "w") as f:
            json.dump(cfg, f)
        print(which, "done")

    if not (aux / "tokenizer_l" / "vocab.json").exists():
        vocab = {}
        chars = [chr(c) for c in range(33, 127)] + [" "]
        for c in chars:
            vocab[c] = len(vocab)
        for c in chars:
            vocab[c + "</w>"] = len(vocab)
        vocab["<|startoftext|>"] = len(vocab)
        vocab["<|endoftext|>"] = len(vocab)
        i = 0
        while len(vocab) < 49408:
            vocab[f"<fill{i}>"] = len(vocab)
            i += 1
        for tok in ("tokenizer_l", "tokenizer_g"):
            (aux / tok).mkdir(parents=True, exist_ok=True)
            with open(aux / tok / "vocab.json", "w") as f:
                json.dump(vocab, f)
            with open(aux / tok / "merges.txt", "w") as f:
                f.write("#version: 0.2\n")
        print("tokenizers done")


def t5_encoder(aux: Path):
    """HF-namespace T5-XXL encoder (encoder.block.N...), fp16 (~9.5 GB)."""
    path = aux / "t5" / "t5xxl.safetensors"
    if path.exists():
        return
    d_model, d_ff, layers, heads, d_kv = 4096, 10240, 24, 64, 64
    sd = {"shared.weight": W(32128, d_model)}
    sd["encoder.final_layer_norm.weight"] = W(d_model) + 1
    sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"] = W(32, heads)
    for i in range(layers):
        pre = f"encoder.block.{i}"
        sd[f"{pre}.layer.0.layer_norm.weight"] = W(d_model) + 1
        sd[f"{pre}.layer.1.layer_norm.weight"] = W(d_model) + 1
        for n in ("q", "k", "v", "o"):
            sd[f"{pre}.layer.0.SelfAttention.{n}.weight"] = W(heads * d_kv, d_model)
        sd[f"{pre}.layer.1.DenseReluDense.wi_0.weight"] = W(d_ff, d_model)
        sd[f"{pre}.layer.1.DenseReluDense.wi_1.weight"] = W(d_ff, d_model)
        sd[f"{pre}.layer.1.DenseReluDense.wo.weight"] = W(d_model, d_ff)
    _save(sd, path)


def t5_tokenizer(root: Path):
    """Fabricated FAST T5 tokenizer (tokenizer.json — no sentencepiece)."""
    tdir = root / "google" / "t5-v1_1-xxl"
    if (tdir / "tokenizer.json").exists():
        return
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, processors

    words = ["<pad>", "</s>", "<unk>"]
    words += [f"tok{i}" for i in range(1000)]
    for c in "abcdefghijklmnopqrstuvwxyz0123456789.,!?'- ":
        words.append(c)
    vocab = {w: i for i, w in enumerate(words)}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.normalizer = normalizers.Lowercase()
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>", pair="$A </s> $B </s>",
        special_tokens=[("</s>", 1)],
    )
    tdir.mkdir(parents=True, exist_ok=True)
    tok.save(str(tdir / "tokenizer.json"))
    with open(tdir / "tokenizer_config.json", "w") as f:
        json.dump({
            "tokenizer_class": "PreTrainedTokenizerFast",
            "unk_token": "<unk>", "eos_token": "</s>", "pad_token": "<pad>",
            "model_max_length": 512,
        }, f)
    print("t5 tokenizer done")


# ---------------------------------------------------------------------------


MODELS = {
    "sd3_medium": (
        "argmaxinc/mlx-stable-diffusion-3-medium/sd3_medium.safetensors",
        lambda: {**sd3_mmdit_sgm(1536, 24), **sgm_vae()},
    ),
    "sd35_large": (
        "argmaxinc/mlx-stable-diffusion-3.5-large/sd3.5_large.safetensors",
        lambda: {**sd3_mmdit_sgm(2432, 38, qk_norm=True), **sgm_vae()},
    ),
    "sd35_large_4bit": (
        "argmaxinc/mlx-stable-diffusion-3.5-large-4bit-quantized/sd3.5_large_4bit_quantized.safetensors",
        sd35_4bit,
    ),
    "flux_schnell": (
        "argmaxinc/mlx-FLUX.1-schnell/flux-schnell.safetensors",
        lambda: flux_bfl(guidance=False),
    ),
    "flux_schnell_4bit": (
        "argmaxinc/mlx-FLUX.1-schnell-4bit-quantized/flux-schnell-4bit-quantized.safetensors",
        flux_4bit,
    ),
    "flux_dev": (
        "argmaxinc/mlx-FLUX.1-dev/flux1-dev.safetensors",
        lambda: flux_bfl(guidance=True),
    ),
}
AE_REPOS = [
    "argmaxinc/mlx-FLUX.1-schnell",
    "argmaxinc/mlx-FLUX.1-schnell-4bit-quantized",
    "argmaxinc/mlx-FLUX.1-dev",
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of: " + ",".join(MODELS) + ",aux,t5,ae")
    args = ap.parse_args(argv)
    only = set(args.only.split(",")) if args.only else None

    aux = ROOT / "argmaxinc/stable-diffusion"
    if only is None or "aux" in only:
        clip_and_tokenizers(aux)
        t5_tokenizer(ROOT)
    if only is None or "t5" in only:
        t5_encoder(aux)
    for name, (rel, build) in MODELS.items():
        if only is not None and name not in only:
            continue
        path = ROOT / rel
        if path.exists():
            print(f"{rel}: exists, skipping")
            continue
        _save(build(), path)
    if only is None or "ae" in only:
        ae = None
        for repo in AE_REPOS:
            path = ROOT / repo / "ae.safetensors"
            if path.exists():
                continue
            ae = bfl_ae() if ae is None else ae
            _save(ae, path)


if __name__ == "__main__":
    main()
