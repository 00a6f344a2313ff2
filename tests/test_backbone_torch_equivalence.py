"""Full ResNet backbone forward vs an independent torch implementation.

Builds a torchvision-style state dict, loads it into BOTH a torch
bottleneck stack (written here from the architecture spec) and our Flax
backbone via the importer, and compares eval-mode feature maps. This
validates the import mapping, padding/dilation conventions, BN eval
semantics, and stage wiring in one shot.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

from hsg_tpu.models import import_torch
from hsg_tpu.models.resnet import ResNetBackbone
from test_checkpoint_import import _fake_torch_state_dict

pytestmark = pytest.mark.slow


class _TorchBottleneck(torch.nn.Module):
    def __init__(self, cin, planes, stride=1, dilation=1, project=False):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride=stride,
                                     padding=dilation, dilation=dilation,
                                     bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if project:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, planes * 4, 1, stride=stride,
                                bias=False),
                torch.nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + r)


class _TorchBackbone(torch.nn.Module):
    """blocks=(1,1,1,1), strides=(1,2,2,1), dilations=(1,1,1,2), with the
    res5 multi-grid first-block rule (dilation 1 for d in {1,2})."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3,
                                     bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.maxpool = torch.nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = torch.nn.Sequential(
            _TorchBottleneck(64, 64, 1, 1, True))
        self.layer2 = torch.nn.Sequential(
            _TorchBottleneck(256, 128, 2, 1, True))
        self.layer3 = torch.nn.Sequential(
            _TorchBottleneck(512, 256, 2, 1, True))
        self.layer4 = torch.nn.Sequential(
            _TorchBottleneck(1024, 512, 1, 1, True))

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.layer4(x)


def test_backbone_forward_matches_torch():
    sd = _fake_torch_state_dict(blocks=(1, 1, 1, 1))
    # Tame magnitudes: unscaled random weights blow activations up to ~1e9
    # over four stages, amplifying f32 reassociation differences into
    # percent-level noise on a handful of elements.
    sd = {k: (v * 0.15 if k.endswith('.weight') and v.ndim == 4 else v)
          for k, v in sd.items()}
    tm = _TorchBackbone()
    missing, unexpected = tm.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items() if not k.startswith('fc')},
        strict=False)
    assert not [m for m in missing if 'num_batches' not in m]
    tm.eval()

    params, stats = import_torch.torch_resnet_to_flax(sd)
    model = ResNetBackbone(blocks=(1, 1, 1, 1))
    x = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    import flax
    fp = flax.traverse_util.flatten_dict(variables['params'])
    fp.update({k: jnp.asarray(v) for k, v in
               flax.traverse_util.flatten_dict(params).items()})
    fs = flax.traverse_util.flatten_dict(variables['batch_stats'])
    fs.update({k: jnp.asarray(v) for k, v in
               flax.traverse_util.flatten_dict(stats).items()})
    out_jax = model.apply(
        {'params': flax.traverse_util.unflatten_dict(fp),
         'batch_stats': flax.traverse_util.unflatten_dict(fs)},
        jnp.asarray(x), False)[3]

    with torch.no_grad():
        out_t = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    out_t = out_t.numpy().transpose(0, 2, 3, 1)
    # rtol covers f32 accumulation-order noise on isolated elements (the
    # XLA and cuDNN/oneDNN conv reduction orders differ); structural
    # mismatches would show as whole-map divergence, not 1-in-32768.
    np.testing.assert_allclose(np.asarray(out_jax), out_t,
                               rtol=2e-2, atol=1e-2)
