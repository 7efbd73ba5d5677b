"""torchvision-weight import verification (ops/resnet.py:import_torch_resnet18).

Builds a synthetic torchvision-shaped resnet18 state_dict (random weights,
no torchvision needed), imports it, and checks:

1. the imported (params, batch_stats) pytrees match ResNet18Backbone's init
   structure and shapes exactly — any OIHW→HWIO or stage-naming slip fails;
2. full forward parity: the flax backbone with imported weights reproduces a
   minimal torch.nn.functional forward of the same state_dict (the actual
   torchvision resnet18 inference graph, reference models/encoder_cnn.py:17-21).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blt_vqg_tpu.ops.resnet import ResNet18Backbone, import_torch_resnet18

torch = pytest.importorskip("torch")
F = torch.nn.functional

_STAGES = ["layer1", "layer2", "layer3", "layer4"]
_FILTERS = [64, 128, 256, 512]


def synthetic_state_dict(seed=0):
    """Random resnet18 state_dict with torchvision's exact key set/shapes."""
    g = torch.Generator().manual_seed(seed)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    sd = {"conv1.weight": t(64, 3, 7, 7),
          "bn1.weight": t(64) + 1.0, "bn1.bias": t(64),
          "bn1.running_mean": t(64),
          "bn1.running_var": torch.rand(64, generator=g) + 0.5}
    in_ch = 64
    for li, (layer, ch) in enumerate(zip(_STAGES, _FILTERS)):
        for bi in range(2):
            p = f"{layer}.{bi}"
            first_in = in_ch if bi == 0 else ch
            sd[f"{p}.conv1.weight"] = t(ch, first_in, 3, 3)
            sd[f"{p}.conv2.weight"] = t(ch, ch, 3, 3)
            for bn in ("bn1", "bn2"):
                sd[f"{p}.{bn}.weight"] = t(ch) + 1.0
                sd[f"{p}.{bn}.bias"] = t(ch)
                sd[f"{p}.{bn}.running_mean"] = t(ch)
                sd[f"{p}.{bn}.running_var"] = torch.rand(ch, generator=g) + 0.5
            if li > 0 and bi == 0:  # torchvision downsample blocks
                sd[f"{p}.downsample.0.weight"] = t(ch, in_ch, 1, 1)
                sd[f"{p}.downsample.1.weight"] = t(ch) + 1.0
                sd[f"{p}.downsample.1.bias"] = t(ch)
                sd[f"{p}.downsample.1.running_mean"] = t(ch)
                sd[f"{p}.downsample.1.running_var"] = (
                    torch.rand(ch, generator=g) + 0.5)
        in_ch = ch
    return sd


def torch_resnet18_forward(sd, x):
    """torchvision resnet18 inference graph via torch.nn.functional only."""
    def conv(x, p, stride, pad):
        return F.conv2d(x, sd[p + ".weight"], stride=stride, padding=pad)

    def bn(x, p):
        return F.batch_norm(x, sd[p + ".running_mean"], sd[p + ".running_var"],
                            sd[p + ".weight"], sd[p + ".bias"],
                            training=False, eps=1e-5)

    x = F.relu(bn(conv(x, "conv1", 2, 3), "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for li, layer in enumerate(_STAGES):
        for bi in range(2):
            p = f"{layer}.{bi}"
            stride = 2 if li > 0 and bi == 0 else 1
            res = x
            y = F.relu(bn(conv(x, p + ".conv1", stride, 1), p + ".bn1"))
            y = bn(conv(y, p + ".conv2", 1, 1), p + ".bn2")
            if f"{p}.downsample.0.weight" in sd:
                res = bn(conv(x, p + ".downsample.0", stride, 0),
                         p + ".downsample.1")
            x = F.relu(y + res)
    return x.mean(dim=(2, 3))  # global average pool → [B, 512]


class TestResnetImport:
    def test_tree_structure_and_shapes_match_init(self):
        sd = synthetic_state_dict()
        params, stats = import_torch_resnet18(sd)
        model = ResNet18Backbone(dtype=jnp.float32)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, 32, 32, 3), jnp.float32))
        want_p = jax.tree.map(lambda a: (a.shape, str(a.dtype.kind)),
                              variables["params"])
        got_p = jax.tree.map(lambda a: (np.shape(a), np.asarray(a).dtype.kind),
                             params)
        assert jax.tree.structure(want_p) == jax.tree.structure(got_p)
        assert jax.tree.leaves(want_p) == jax.tree.leaves(got_p)
        want_s = jax.tree.map(np.shape, variables["batch_stats"])
        got_s = jax.tree.map(np.shape, stats)
        assert jax.tree.structure(want_s) == jax.tree.structure(got_s)
        assert jax.tree.leaves(want_s) == jax.tree.leaves(got_s)

    def test_forward_parity_vs_torch(self):
        sd = synthetic_state_dict(seed=3)
        params, stats = import_torch_resnet18(sd)
        x_nchw = torch.randn(2, 3, 64, 64,
                             generator=torch.Generator().manual_seed(7))
        with torch.no_grad():
            golden = torch_resnet18_forward(sd, x_nchw).numpy()

        model = ResNet18Backbone(dtype=jnp.float32)
        x_nhwc = jnp.asarray(x_nchw.numpy().transpose(0, 2, 3, 1))
        out = model.apply({"params": params, "batch_stats": stats},
                          x_nhwc, train=False)
        assert out.shape == (2, 512)
        np.testing.assert_allclose(np.asarray(out), golden,
                                   rtol=2e-4, atol=2e-4)
