"""Generate a full-size synthetic SD3-medium checkpoint mirror (random fp16)
in the raw layouts the real checkpoints use."""
import json, os
import numpy as np
from pathlib import Path
from safetensors.numpy import save_file

ROOT = Path(__file__).resolve().parent.parent / ".ckpt_mirror"
rs = np.random.RandomState(0)
BASE = (rs.randn(1 << 20).astype(np.float16) * 0.02)

def W(*shape):
    n = int(np.prod(shape))
    return np.resize(BASE, n).reshape(shape)

# ---------------- SD3-medium MMDiT (sgm namespace) + VAE ----------------
H, DEPTH, MLP = 1536, 24, 4
sd = {}
pfx = "model.diffusion_model."
for i in range(DEPTH):
    last = i == DEPTH - 1
    for blk in ("x_block", "context_block"):
        b = f"{pfx}joint_blocks.{i}.{blk}"
        sd[f"{b}.attn.qkv.weight"] = W(3*H, H); sd[f"{b}.attn.qkv.bias"] = W(3*H)
        skip = last and blk == "context_block"
        nm = 2 if skip else 6
        sd[f"{b}.adaLN_modulation.1.weight"] = W(nm*H, H)
        sd[f"{b}.adaLN_modulation.1.bias"] = W(nm*H)
        if not skip:
            sd[f"{b}.attn.proj.weight"] = W(H, H); sd[f"{b}.attn.proj.bias"] = W(H)
            sd[f"{b}.mlp.fc1.weight"] = W(MLP*H, H); sd[f"{b}.mlp.fc1.bias"] = W(MLP*H)
            sd[f"{b}.mlp.fc2.weight"] = W(H, MLP*H); sd[f"{b}.mlp.fc2.bias"] = W(H)
sd[pfx+"x_embedder.proj.weight"] = W(H, 16, 2, 2); sd[pfx+"x_embedder.proj.bias"] = W(H)
sd[pfx+"pos_embed"] = W(1, 36864, H)
sd[pfx+"context_embedder.weight"] = W(H, 4096); sd[pfx+"context_embedder.bias"] = W(H)
for name, din in (("t_embedder", 256), ("y_embedder", 2048)):
    sd[f"{pfx}{name}.mlp.0.weight"] = W(H, din); sd[f"{pfx}{name}.mlp.0.bias"] = W(H)
    sd[f"{pfx}{name}.mlp.2.weight"] = W(H, H); sd[f"{pfx}{name}.mlp.2.bias"] = W(H)
sd[pfx+"final_layer.adaLN_modulation.1.weight"] = W(2*H, H)
sd[pfx+"final_layer.adaLN_modulation.1.bias"] = W(2*H)
sd[pfx+"final_layer.linear.weight"] = W(64, H); sd[pfx+"final_layer.linear.bias"] = W(64)

# VAE (sgm) under first_stage_model.
def vae(prefix, ch, layers, in_ch, out_ch, down):
    d = {}
    first = ch[0] if down else ch[-1]
    d[prefix+"conv_in.weight"] = W(first, in_ch, 3, 3); d[prefix+"conv_in.bias"] = W(first)
    mid = ch[-1]
    for blk in ("block_1", "block_2"):
        for n in ("norm1", "norm2"):
            d[f"{prefix}mid.{blk}.{n}.weight"] = W(mid)+1; d[f"{prefix}mid.{blk}.{n}.bias"] = W(mid)
        d[f"{prefix}mid.{blk}.conv1.weight"] = W(mid, mid, 3, 3); d[f"{prefix}mid.{blk}.conv1.bias"] = W(mid)
        d[f"{prefix}mid.{blk}.conv2.weight"] = W(mid, mid, 3, 3); d[f"{prefix}mid.{blk}.conv2.bias"] = W(mid)
    d[prefix+"mid.attn_1.norm.weight"] = W(mid)+1; d[prefix+"mid.attn_1.norm.bias"] = W(mid)
    for n in ("q", "k", "v", "proj_out"):
        d[f"{prefix}mid.attn_1.{n}.weight"] = W(mid, mid, 1, 1); d[f"{prefix}mid.attn_1.{n}.bias"] = W(mid)
    if down:
        seq = list(zip([ch[0]] + list(ch), ch)); word = "down"
    else:
        rev = list(reversed(ch)); seq = list(zip([rev[0]] + rev, rev)); word = "up"
    for i, (cin, cout) in enumerate(seq[:len(ch)]):
        idx = i if down else len(ch)-1-i
        for j in range(layers):
            cin_j = cin if j == 0 else cout
            b = f"{prefix}{word}.{idx}.block.{j}"
            d[f"{b}.norm1.weight"] = W(cin_j)+1; d[f"{b}.norm1.bias"] = W(cin_j)
            d[f"{b}.conv1.weight"] = W(cout, cin_j, 3, 3); d[f"{b}.conv1.bias"] = W(cout)
            d[f"{b}.norm2.weight"] = W(cout)+1; d[f"{b}.norm2.bias"] = W(cout)
            d[f"{b}.conv2.weight"] = W(cout, cout, 3, 3); d[f"{b}.conv2.bias"] = W(cout)
            if cin_j != cout:
                d[f"{b}.nin_shortcut.weight"] = W(cout, cin_j, 1, 1); d[f"{b}.nin_shortcut.bias"] = W(cout)
        if i < len(ch)-1:
            if down:
                d[f"{prefix}down.{idx}.downsample.conv.weight"] = W(cout, cout, 3, 3)
                d[f"{prefix}down.{idx}.downsample.conv.bias"] = W(cout)
            else:
                d[f"{prefix}up.{idx}.upsample.conv.weight"] = W(cout, cout, 3, 3)
                d[f"{prefix}up.{idx}.upsample.conv.bias"] = W(cout)
    lastc = ch[0] if not down else ch[-1]
    d[prefix+"norm_out.weight"] = W(lastc)+1; d[prefix+"norm_out.bias"] = W(lastc)
    d[prefix+"conv_out.weight"] = W(out_ch, lastc, 3, 3); d[prefix+"conv_out.bias"] = W(out_ch)
    return d

CH = (128, 256, 512, 512)
sd.update(vae("first_stage_model.decoder.", CH, 3, 16, 3, down=False))
sd.update(vae("first_stage_model.encoder.", CH, 2, 3, 32, down=True))
out = ROOT / "argmaxinc/mlx-stable-diffusion-3-medium"
out.mkdir(parents=True, exist_ok=True)
save_file(sd, str(out / "sd3_medium.safetensors"))
print("sd3_medium:", sum(v.size for v in sd.values())/1e9, "B params")
del sd

# ---------------- CLIP l/g (HF namespace) + tokenizers ----------------
aux = ROOT / "argmaxinc/stable-diffusion"
for which, layers, dim, heads, proj in (("clip_l", 12, 768, 12, None), ("clip_g", 32, 1280, 20, 1280)):
    d = {}
    d["text_model.embeddings.token_embedding.weight"] = W(49408, dim)
    d["text_model.embeddings.position_embedding.weight"] = W(77, dim)
    d["text_model.final_layer_norm.weight"] = W(dim)+1
    d["text_model.final_layer_norm.bias"] = W(dim)
    for i in range(layers):
        pre = f"text_model.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            d[f"{pre}.{ln}.weight"] = W(dim)+1; d[f"{pre}.{ln}.bias"] = W(dim)
        for pn in ("q_proj", "k_proj", "v_proj", "out_proj"):
            d[f"{pre}.self_attn.{pn}.weight"] = W(dim, dim); d[f"{pre}.self_attn.{pn}.bias"] = W(dim)
        d[f"{pre}.mlp.fc1.weight"] = W(4*dim, dim); d[f"{pre}.mlp.fc1.bias"] = W(4*dim)
        d[f"{pre}.mlp.fc2.weight"] = W(dim, 4*dim); d[f"{pre}.mlp.fc2.bias"] = W(dim)
    if proj:
        d["text_projection.weight"] = W(proj, dim)
    (aux / which).mkdir(parents=True, exist_ok=True)
    save_file(d, str(aux / which / "model.fp16.safetensors"))
    cfg = {"num_hidden_layers": layers, "hidden_size": dim, "num_attention_heads": heads,
           "max_position_embeddings": 77, "vocab_size": 49408, "projection_dim": proj,
           "hidden_act": "gelu" if proj else "quick_gelu"}
    with open(aux / which / "config.json", "w") as f:
        json.dump(cfg, f)
    print(which, "done")

# synthetic CLIP vocab: printable chars + filler to 49408
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
    vocab[f"<fill{i}>"] = len(vocab); i += 1
for tok in ("tokenizer_l", "tokenizer_g"):
    (aux / tok).mkdir(parents=True, exist_ok=True)
    with open(aux / tok / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(aux / tok / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
print("tokenizers done")
