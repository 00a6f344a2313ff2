"""HTTP serving daemon (pyscripts/serve.py) end-to-end: export a tiny
artifact, launch the real server as a subprocess, label an image over
HTTP. The reference has no serving stack (SURVEY.md); this is the
deployment surface for the pyscripts/export.py artifact."""

import io
import json
import os
import subprocess
import sys
import urllib.error
import urllib.request

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from hsg_tpu.eval import export_lib
from test_export import _tiny_setup

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _export_tiny_artifact(dirpath, serve_batch=2):
    import jax

    cfg, model, variables, memory, memory_labels = _tiny_setup()
    fn = export_lib.make_serving_fn(model, variables, memory, memory_labels,
                                    cfg)
    example = (jnp.zeros((32, 32, 3), jnp.float32), jnp.int32(32),
               jnp.int32(32))
    export_lib.export_serving(fn, example, os.path.join(dirpath,
                                                        'serving.bin'))
    if serve_batch:
        batch_example = (jnp.zeros((serve_batch, 32, 32, 3), jnp.float32),
                         jnp.full((serve_batch,), 32, jnp.int32),
                         jnp.full((serve_batch,), 32, jnp.int32))
        export_lib.export_serving(
            jax.vmap(fn), batch_example,
            os.path.join(dirpath, 'serving_batch.bin'))
    export_lib.write_sidecar(os.path.join(dirpath, 'serving.json'), cfg,
                             memory.shape[0], serve_batch=serve_batch)
    return cfg


@pytest.mark.slow
def test_serve_http_roundtrip(tmp_path):
    cfg = _export_tiny_artifact(str(tmp_path))

    env = dict(os.environ, HSG_TPU_PLATFORM='cpu',
               PYTHONPATH=REPO + ':' + os.environ.get('PYTHONPATH', ''))
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, 'pyscripts', 'serve.py'),
         '--artifact_dir', str(tmp_path), '--port', '0'],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env)
    import threading
    # Hard deadline even if the server wedges before printing anything
    # (readline would block forever; the killed process yields EOF and
    # the assertions below report the failure).
    killer = threading.Timer(540, proc.kill)
    killer.start()
    try:
        # The startup line carries the picked port (--port 0 = ephemeral).
        line = ''
        for line in proc.stdout:
            if line.startswith('serving '):
                break
        assert 'http://127.0.0.1:' in line, line
        port = int(line.split('http://127.0.0.1:')[1].split(' ')[0].strip())
        base = f'http://127.0.0.1:{port}'

        health = json.loads(urllib.request.urlopen(
            f'{base}/healthz', timeout=60).read())
        assert health['status'] == 'ok' and health['backend'] == 'cpu'

        meta = json.loads(urllib.request.urlopen(
            f'{base}/meta', timeout=60).read())
        assert meta['crop_size'] == [32, 32]

        # A non-crop-sized image exercises the resize+pad preprocessing
        # and the resize-back postprocessing.
        rng = np.random.default_rng(0)
        img = Image.fromarray(
            rng.integers(0, 256, (40, 56, 3), dtype=np.uint8).astype(
                np.uint8))
        buf = io.BytesIO()
        img.save(buf, format='PNG')

        def post(url):
            req = urllib.request.Request(
                url, data=buf.getvalue(),
                headers={'Content-Type': 'image/png'})
            return urllib.request.urlopen(req, timeout=300).read()

        pred = np.asarray(Image.open(io.BytesIO(post(f'{base}/label'))))
        assert pred.shape == (40, 56)
        assert pred.max() < cfg.dataset.num_classes

        color = np.asarray(
            Image.open(io.BytesIO(post(f'{base}/label?color=1'))))
        assert color.shape == (40, 56, 3)

        bad = urllib.request.Request(f'{base}/label', data=b'not an image')
        try:
            urllib.request.urlopen(bad, timeout=60)
            raise AssertionError('expected HTTP 400 for a bad image')
        except urllib.error.HTTPError as e:
            assert e.code == 400

        health = json.loads(urllib.request.urlopen(
            f'{base}/healthz', timeout=60).read())
        assert health['requests'] == 2

        # --- concurrent requests (ThreadingHTTPServer + artifact lock):
        # two simultaneous POST /label round-trips must both succeed
        # (VERDICT r4, item 8).
        results = [None, None]

        def worker(i):
            results[i] = post(f'{base}/label')

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for r in results:
            assert r is not None, 'concurrent request did not complete'
            got = np.asarray(Image.open(io.BytesIO(r)))
            np.testing.assert_array_equal(got, pred)
        health = json.loads(urllib.request.urlopen(
            f'{base}/healthz', timeout=60).read())
        assert health['requests'] == 4

        # --- batched endpoint: two differently-sized images through the
        # vmapped serving_batch.bin in one request; per-image results
        # must equal the per-window endpoint's.
        img2 = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        nbuf = io.BytesIO()
        np.savez(nbuf, image_0=np.asarray(img), image_1=img2)
        req = urllib.request.Request(
            f'{base}/label_batch', data=nbuf.getvalue(),
            headers={'Content-Type': 'application/octet-stream'})
        out = np.load(io.BytesIO(
            urllib.request.urlopen(req, timeout=300).read()))
        assert sorted(out.files) == ['pred_0', 'pred_1']
        np.testing.assert_array_equal(out['pred_0'], pred)
        assert out['pred_1'].shape == (24, 32)
        assert out['pred_1'].max() < cfg.dataset.num_classes

        buf2 = io.BytesIO()
        Image.fromarray(img2).save(buf2, format='PNG')
        req2 = urllib.request.Request(
            f'{base}/label', data=buf2.getvalue(),
            headers={'Content-Type': 'image/png'})
        single2 = np.asarray(Image.open(io.BytesIO(
            urllib.request.urlopen(req2, timeout=300).read())))
        np.testing.assert_array_equal(out['pred_1'], single2)

        bad = urllib.request.Request(f'{base}/label_batch', data=b'junk')
        try:
            urllib.request.urlopen(bad, timeout=60)
            raise AssertionError('expected HTTP 400 for a bad batch')
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        killer.cancel()
        proc.kill()
        proc.wait()
