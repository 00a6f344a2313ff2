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
        # Optional vmapped companion (pyscripts/export.py --serve_batch):
        # one dispatch labels `serve_batch` windows.
        self.batch_fn = None
        self.batch = int(self.meta.get('serve_batch', 0))
        batch_path = os.path.join(artifact_dir, 'serving_batch.bin')
        if self.batch > 0 and os.path.exists(batch_path):
            self.batch_fn = export_lib.load_serving(batch_path)
        else:
            self.batch = 0
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
        if self.batch_fn is not None:
            b = self.batch
            np.asarray(self.batch_fn(
                jnp.zeros((b, ch, cw, 3), jnp.float32),
                jnp.full((b,), ch, jnp.int32),
                jnp.full((b,), cw, jnp.int32)))

    def _preprocess(self, image_u8):
        """image_u8 [h,w,3] -> (canvas [ch,cw,3] f32, rh, rw)."""
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
        return canvas, rh, rw

    @staticmethod
    def _postprocess(pred, rh, rw, h, w):
        from PIL import Image

        return np.asarray(
            Image.fromarray(pred[:rh, :rw], mode='L').resize(
                (w, h), Image.NEAREST))

    def label(self, image_u8):
        """image_u8 [h,w,3] -> label indices [h,w] u8 at the input size."""
        h, w = image_u8.shape[:2]
        canvas, rh, rw = self._preprocess(image_u8)
        jnp = self._jnp
        with self.lock:
            self.requests += 1
            pred = np.asarray(self.fn(jnp.asarray(canvas),
                                      jnp.int32(rh), jnp.int32(rw)))
        return self._postprocess(pred, rh, rw, h, w)

    def label_batch(self, images_u8):
        """[images [h_i,w_i,3]] -> [labels [h_i,w_i] u8] in one or few
        device dispatches through the vmapped artifact (chunks of
        `serve_batch` windows; the tail chunk is zero-padded). Falls back
        to the per-window artifact when no batch artifact was exported."""
        if self.batch_fn is None:
            return [self.label(im) for im in images_u8]
        pre = [self._preprocess(im) for im in images_u8]
        canvases = np.stack([c for c, _, _ in pre])
        rhs = np.asarray([rh for _, rh, _ in pre], np.int32)
        rws = np.asarray([rw for _, _, rw in pre], np.int32)
        n, b = len(pre), self.batch
        pad = (-n) % b
        if pad:
            canvases = np.concatenate(
                [canvases, np.zeros((pad,) + canvases.shape[1:],
                                    canvases.dtype)])
            rhs = np.concatenate([rhs, np.ones((pad,), np.int32)])
            rws = np.concatenate([rws, np.ones((pad,), np.int32)])
        jnp = self._jnp
        preds = []
        with self.lock:
            self.requests += len(images_u8)
            for st in range(0, n + pad, b):
                preds.append(np.asarray(self.batch_fn(
                    jnp.asarray(canvases[st:st + b]),
                    jnp.asarray(rhs[st:st + b]),
                    jnp.asarray(rws[st:st + b]))))
        preds = np.concatenate(preds)[:n]
        return [self._postprocess(p, rh, rw, im.shape[0], im.shape[1])
                for p, (_, rh, rw), im in zip(preds, pre, images_u8)]


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
            if url.path == '/label_batch':
                self._label_batch()
                return
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

        def _label_batch(self):
            """POST /label_batch: body = NPZ with arrays image_0..image_N-1
            ([h,w,3] u8, sizes may differ); response = NPZ with
            pred_0..pred_N-1 ([h,w] u8). Windows ride the vmapped batch
            artifact in chunks of `serve_batch` (per-window fallback when
            the batch artifact wasn't exported)."""
            try:
                n = int(self.headers.get('Content-Length', 0))
                data = np.load(io.BytesIO(self.rfile.read(n)))
                keys = sorted(data.files,
                              key=lambda k: int(k.split('_')[-1]))
                images = []
                for k in keys:
                    im = np.asarray(data[k])
                    if im.ndim != 3 or im.shape[-1] != 3:
                        raise ValueError(f'{k}: want [h,w,3] u8, '
                                         f'got {im.shape}')
                    images.append(im.astype(np.uint8))
                if not images:
                    raise ValueError('empty batch')
            except Exception as e:  # noqa: BLE001 — client error surface
                self._json(400, {'error': f'bad batch: {e}'})
                return
            try:
                preds = runner.label_batch(images)
            except Exception as e:  # noqa: BLE001 — server error surface
                self._json(500, {'error': f'inference failed: {e}'})
                return
            buf = io.BytesIO()
            np.savez(buf, **{f'pred_{i}': p for i, p in enumerate(preds)})
            self._send(200, buf.getvalue(), 'application/octet-stream')

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
