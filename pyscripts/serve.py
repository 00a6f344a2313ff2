"""HTTP serving daemon for an exported artifact (pyscripts/export.py).

The reference ships no deployment path at all (SURVEY.md: "no serving
stack"; its inference is the eager per-image loop in the reference's
pyscripts/inference/inference.py:111-252). This turns the standalone
`jax.export` artifact into a production endpoint using only the
standard library: load `serving.bin` + its `serving.json` sidecar,
compile once at startup, then label images over HTTP.

Endpoints:
  GET  /healthz -> {"status":"ok","backend":...,"requests":N}
  GET  /meta    -> the sidecar JSON (the preprocessing contract)
  POST /label   -> body: PNG/JPEG bytes; response: PNG (mode L) of
                   per-pixel class indices at the ORIGINAL image size.
                   `?color=1` returns the VOC-colormapped RGB PNG.

Preprocessing mirrors the eval pipeline exactly (pyscripts/
eval_common.py `preprocess_image` + data/dataset.py `__getitem__`):
resize the larger side to `image_size` (clamped so the result fits the
artifact's fixed crop), normalize (x/255 - mean)/std, zero-pad to crop;
the prediction is cropped back to the resized extent and nearest-
upsampled to the client's original size (inference.py `save_pred`).

Usage:
  python pyscripts/serve.py --artifact_dir <dir with serving.bin/json> \
      [--host 127.0.0.1] [--port 8389] [--warmup/--no-warmup]

One device serves one request at a time (the artifact call is guarded
by a lock); health/meta stay responsive from other threads.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class _Runner:
    """Owns the deserialized artifact + preprocessing contract."""

    def __init__(self, artifact_dir):
        from pyscripts import common as pys_common
        pys_common._apply_platform_override()
        import jax

        from hsg_tpu.eval import export_lib
        from hsg_tpu.utils import vis

        with open(os.path.join(artifact_dir, 'serving.json')) as f:
            self.meta = json.load(f)
        self.fn = export_lib.load_serving(
            os.path.join(artifact_dir, 'serving.bin'))
        self.backend = jax.devices()[0].platform
        self.color_map = vis.voc_color_map()
        self.lock = threading.Lock()
        self.requests = 0
        self._jnp = jax.numpy

    def warmup(self):
        ch, cw = self.meta['crop_size']
        jnp = self._jnp
        np.asarray(self.fn(jnp.zeros((ch, cw, 3), jnp.float32),
                           jnp.int32(ch), jnp.int32(cw)))

    def label(self, image_u8):
        """image_u8 [h,w,3] -> label indices [h,w] u8 at the input size."""
        from PIL import Image

        h, w = image_u8.shape[:2]
        ch, cw = self.meta['crop_size']
        size = self.meta['image_size']
        # image_size>0: resize the larger side to it (eval_common
        # semantics); else keep the native size — in both cases clamped
        # so the result fits the artifact's fixed single window (the
        # batch eval path tiles larger canvases with sliding windows;
        # a serving endpoint downscales instead).
        scale = size / max(h, w) if size > 0 else 1.0
        scale = min(scale, ch / h, cw / w)
        rh, rw = max(1, round(h * scale)), max(1, round(w * scale))
        resized = np.asarray(
            Image.fromarray(image_u8).resize((rw, rh), Image.BILINEAR))
        mean = np.asarray(self.meta['pixel_means'], np.float32)
        std = np.asarray(self.meta['pixel_stds'], np.float32)
        canvas = np.zeros((ch, cw, 3), np.float32)
        canvas[:rh, :rw] = (resized.astype(np.float32) / 255.0 - mean) / std

        jnp = self._jnp
        with self.lock:
            self.requests += 1
            pred = np.asarray(self.fn(jnp.asarray(canvas),
                                      jnp.int32(rh), jnp.int32(rw)))
        pred = pred[:rh, :rw]
        return np.asarray(
            Image.fromarray(pred, mode='L').resize((w, h), Image.NEAREST))


def make_handler(runner):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet; stdout is the log
            print(f'{self.address_string()} {fmt % args}', flush=True)

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header('Content-Type', ctype)
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code, obj):
            self._send(code, json.dumps(obj).encode(), 'application/json')

        def do_GET(self):
            path = urlparse(self.path).path
            if path == '/healthz':
                self._json(200, {'status': 'ok', 'backend': runner.backend,
                                 'requests': runner.requests})
            elif path == '/meta':
                self._json(200, runner.meta)
            else:
                self._json(404, {'error': f'unknown path {path}'})

        def do_POST(self):
            from PIL import Image

            url = urlparse(self.path)
            if url.path != '/label':
                self._json(404, {'error': f'unknown path {url.path}'})
                return
            try:
                n = int(self.headers.get('Content-Length', 0))
                img = Image.open(io.BytesIO(self.rfile.read(n)))
                image_u8 = np.asarray(img.convert('RGB'), np.uint8)
            except Exception as e:  # noqa: BLE001 — client error surface
                self._json(400, {'error': f'bad image: {e}'})
                return
            try:
                pred = runner.label(image_u8)
            except Exception as e:  # noqa: BLE001 — server error surface
                self._json(500, {'error': f'inference failed: {e}'})
                return
            color = parse_qs(url.query).get('color', ['0'])[0] == '1'
            if color:
                from hsg_tpu.utils import vis
                out = Image.fromarray(
                    vis.convert_label_to_color(pred, runner.color_map))
            else:
                out = Image.fromarray(pred, mode='L')
            buf = io.BytesIO()
            out.save(buf, format='PNG')
            self._send(200, buf.getvalue(), 'image/png')

    return Handler


def main():
    p = argparse.ArgumentParser(
        description='Serve an exported artifact over HTTP.')
    p.add_argument('--artifact_dir', required=True,
                   help='directory holding serving.bin + serving.json')
    p.add_argument('--host', default='127.0.0.1')
    p.add_argument('--port', type=int, default=8389)
    p.add_argument('--no_warmup', action='store_true',
                   help='skip the compile-at-startup call')
    args = p.parse_args()

    runner = _Runner(args.artifact_dir)
    if not args.no_warmup:
        runner.warmup()
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(runner))
    print(f'serving {args.artifact_dir} on http://{args.host}:'
          f'{server.server_address[1]} (backend={runner.backend}, '
          f'{runner.meta["memory_prototypes"]} prototypes)', flush=True)
    server.serve_forever()


if __name__ == '__main__':
    main()
