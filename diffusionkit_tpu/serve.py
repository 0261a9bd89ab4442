"""Minimal production image-generation server.

Serving layer over DiffusionPipeline/FluxPipeline (beyond the reference's
scope — it ships only a CLI — but this framework targets production serving).
Stdlib-only HTTP server; requests are serialized through a single lock
because one pipeline owns one chip/mesh (XLA programs are already
compiled+cached after the first request of each shape).

POST /generate  {"prompt": str, "steps": int, "cfg": float, "seed": int?,
                 "negative_prompt": str?, "height": int?, "width": int?,
                 "num_images": int?, "guidance": float?}
  -> image/png (single) or multipart JSON with base64 images (num_images > 1)
GET /healthz -> {"status": "ok", ...device info}
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from .utils import get_logger, inference_context

logger = get_logger(__name__)


class GenerationServer:
    def __init__(self, pipeline, default_steps: int = 4, default_cfg: float = 0.0):
        self.pipeline = pipeline
        self.default_steps = default_steps
        self.default_cfg = default_cfg
        self.lock = threading.Lock()

    def generate(self, req: dict):
        height = int(req.get("height", 512))
        width = int(req.get("width", 512))
        if height % 16 or width % 16:
            raise ValueError("height/width must be divisible by 16")
        with self.lock:  # one chip, one request at a time
            image, log = self.pipeline.generate_image(
                req["prompt"],
                num_steps=int(req.get("steps", self.default_steps)),
                cfg_weight=float(req.get("cfg", self.default_cfg)),
                negative_text=req.get("negative_prompt", ""),
                latent_size=(height // 8, width // 8),
                seed=req.get("seed"),
                verbose=False,
                num_images=int(req.get("num_images", 1)),
                guidance=req.get("guidance"),
            )
        return image, log

    def handler_class(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # route through our logger
                logger.info("%s " + fmt, self.client_address[0], *args)

            def _json(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._json(200, {"status": "ok", **inference_context()})
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/generate":
                    self._json(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    if "prompt" not in req:
                        self._json(400, {"error": "missing 'prompt'"})
                        return
                    image, log = server.generate(req)
                except ValueError as e:
                    self._json(400, {"error": str(e)})
                    return
                except Exception as e:  # pragma: no cover
                    logger.exception("generation failed")
                    self._json(500, {"error": f"{type(e).__name__}: {e}"})
                    return

                if isinstance(image, list):
                    payload = {
                        "images": [_png_b64(im) for im in image],
                        "timings": {
                            k: log[k]["time"]
                            for k in ("text_encoding", "denoising", "decoding")
                        },
                    }
                    self._json(200, payload)
                else:
                    data = _png_bytes(image)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(data)))
                    self.send_header(
                        "X-Denoise-Time", str(log["denoising"]["time"])
                    )
                    self.end_headers()
                    self.wfile.write(data)

        return Handler

    def serve_forever(self, host: str = "0.0.0.0", port: int = 8000):
        httpd = ThreadingHTTPServer((host, port), self.handler_class())
        logger.info("Serving on %s:%d", host, port)
        httpd.serve_forever()


def _png_bytes(image) -> bytes:
    buf = io.BytesIO()
    image.save(buf, format="PNG")
    return buf.getvalue()


def _png_b64(image) -> str:
    return base64.b64encode(_png_bytes(image)).decode()


def main(argv=None):
    """``python -m diffusionkit_tpu.serve --model-version ... --port 8000``"""
    import argparse

    from .pipeline import DiffusionPipeline, FluxPipeline

    ap = argparse.ArgumentParser(description="diffusionkit-tpu generation server")
    ap.add_argument("--model-version", default="argmaxinc/mlx-FLUX.1-schnell")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--shift", type=float, default=None)
    ap.add_argument("--t5", action="store_true")
    ap.add_argument("--use-scan", action=argparse.BooleanOptionalAction, default=True)
    args = ap.parse_args(argv)

    is_flux = "FLUX" in args.model_version
    cls = FluxPipeline if is_flux else DiffusionPipeline
    pipe = cls(
        model_version=args.model_version,
        shift=args.shift if args.shift is not None else (1.0 if is_flux else 3.0),
        use_t5=args.t5,
        low_memory_mode=False,  # serving keeps everything resident
        use_scan=args.use_scan,
    )
    GenerationServer(
        pipe,
        default_steps=4 if is_flux else 50,
        default_cfg=0.0 if is_flux else 5.0,
    ).serve_forever(args.host, args.port)


if __name__ == "__main__":
    main()
