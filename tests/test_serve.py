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


def _export_tiny_artifact(dirpath):
    cfg, model, variables, memory, memory_labels = _tiny_setup()
    fn = export_lib.make_serving_fn(model, variables, memory, memory_labels,
                                    cfg)
    example = (jnp.zeros((32, 32, 3), jnp.float32), jnp.int32(32),
               jnp.int32(32))
    export_lib.export_serving(fn, example, os.path.join(dirpath,
                                                        'serving.bin'))
    export_lib.write_sidecar(os.path.join(dirpath, 'serving.json'), cfg,
                             memory.shape[0])
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
    finally:
        killer.cancel()
        proc.kill()
        proc.wait()
