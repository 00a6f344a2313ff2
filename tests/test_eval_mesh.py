"""Mesh-sharded sliding-window eval == single-device eval.

`pyscripts/eval_common.make_embed_fn(mesh=...)` shards the window batch
over a 1-D data mesh (windows are independent eval-mode forwards — no
collectives), padding N to a mesh multiple internally. The canvas it
feeds must be identical to the unsharded path, including when the
window count does NOT divide the mesh size (exercises the pad+slice).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hsg_tpu.config import default_config
from hsg_tpu.eval import sliding
from hsg_tpu.models import fcn as fcn_lib
from hsg_tpu.parallel import mesh as mesh_lib
from pyscripts import eval_common


def _tiny_model():
    cfg = default_config()
    cfg.network.embedding_dim = 16
    cfg.network.kmeans_num_clusters = (2, 2)
    cfg.network.kmeans_iterations = 2
    cfg.network.max_segments_per_view = 8
    return fcn_lib.ResnetFcn(
        backbone_depth=(1, 1, 1, 1), embedding_dim=16,
        kmeans_num_clusters=(2, 2), kmeans_iterations=2, max_segments=8)


def test_sharded_windows_match_unsharded():
    assert len(jax.devices()) == 8, 'conftest must provide 8 CPU devices'
    model = _tiny_model()
    rng = np.random.default_rng(0)
    # 80x80 image, 32x32 crop, stride 24 -> 3x3 = 9 windows: 9 % 8 != 0,
    # so the mesh path must pad to 16 and slice back.
    image = jnp.asarray(rng.normal(size=(80, 80, 3)), jnp.float32)
    init = model.init(jax.random.PRNGKey(0), image[None, :32, :32], None,
                      None, train=False)

    plain = eval_common.make_embed_fn(model, init)
    meshed = eval_common.make_embed_fn(
        model, init, mesh=mesh_lib.create_mesh(8))

    want = sliding.sliding_window_embeddings(
        plain, image, (32, 32), (24, 24))
    got = sliding.sliding_window_embeddings(
        meshed, image, (32, 32), (24, 24))
    assert int(np.ceil((80 - 32) / 24)) + 1 == 3  # 9-window premise
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)
