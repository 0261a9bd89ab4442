"""Client for the generation server (diffusionkit_tpu/serve.py).

Start the server first, e.g.:
    python -m diffusionkit_tpu.serve \
        --model-version argmaxinc/mlx-FLUX.1-schnell-4bit-quantized \
        --quantize-mmdit w4a8 --quantize-t5 --port 8000

Then:
    python examples/serve_client.py --prompt "a red bicycle" --out img.png

Demonstrates the production surfaces: 503 back-off (bounded queue /
draining), 504 request timeout, and the /metrics endpoint.
"""

import argparse
import json
import time
import urllib.error
import urllib.request


def post_generate(base, payload, retries=5):
    data = json.dumps(payload).encode()
    for attempt in range(retries):
        req = urllib.request.Request(
            f"{base}/generate", data=data,
            headers={"Content-Type": "application/json"},
        )
        try:
            return urllib.request.urlopen(req, timeout=900)
        except urllib.error.HTTPError as e:
            if e.code == 503:  # overloaded/draining: honor Retry-After
                wait = float(e.headers.get("Retry-After", 5))
                print(f"503 (queue full) — retrying in {wait:.0f}s")
                time.sleep(wait)
                continue
            raise
    raise RuntimeError("server stayed overloaded")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    ap.add_argument("--prompt", default="a photo of a cat in a wizard hat")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int)
    ap.add_argument("--out", default="out.png")
    args = ap.parse_args()

    with urllib.request.urlopen(f"{args.url}/healthz", timeout=30) as r:
        print("healthz:", json.load(r))

    payload = {
        "prompt": args.prompt, "steps": args.steps, "cfg": 0.0,
        "height": args.size, "width": args.size,
    }
    if args.seed is not None:
        payload["seed"] = args.seed
    t0 = time.time()
    with post_generate(args.url, payload) as r:
        body = r.read()
    with open(args.out, "wb") as f:
        f.write(body)
    print(f"wrote {args.out} in {time.time() - t0:.1f}s")

    with urllib.request.urlopen(f"{args.url}/metrics", timeout=30) as r:
        print("metrics:", json.load(r))


if __name__ == "__main__":
    main()
