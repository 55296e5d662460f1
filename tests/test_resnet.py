"""ResNet backbone: shapes + torchvision parity of the bottleneck layout."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mqdet_tpu.models.resnet import ResNet, resnet50


@pytest.mark.slow  # ~14s, optional backbone
def test_resnet50_shapes(rng):
    m = ResNet(depths=(1, 1, 1, 1))
    x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert [o.shape for o in outs] == [
        (1, 16, 24, 256), (1, 8, 12, 512), (1, 4, 6, 1024), (1, 2, 3, 2048)
    ]


def test_resnet50_matches_torchvision(rng):
    torchvision = pytest.importorskip("torchvision")
    if not hasattr(getattr(torchvision, "models", None), "resnet50"):
        # ref_harness stubs "torchvision" into sys.modules for reference
        # imports; the stub must not masquerade as the real oracle
        pytest.skip("real torchvision not installed")
    import torch
    from flax.traverse_util import unflatten_dict

    tv = torchvision.models.resnet50(weights=None).eval()
    sd = tv.state_dict()

    m = resnet50()
    x_np = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x_np))

    def conv_w(name):
        return jnp.asarray(sd[name].numpy().transpose(2, 3, 1, 0))

    def bn(prefix):
        return {
            "scale": jnp.asarray(sd[prefix + ".weight"].numpy()),
            "bias": jnp.asarray(sd[prefix + ".bias"].numpy()),
            "mean": jnp.asarray(sd[prefix + ".running_mean"].numpy()),
            "var": jnp.asarray(sd[prefix + ".running_var"].numpy()),
        }

    flat = {}
    flat[("stem_conv", "kernel")] = conv_w("conv1.weight")
    for k, v in bn("bn1").items():
        flat[("stem_bn", k)] = v
    for stage, blocks in enumerate([3, 4, 6, 3], start=1):
        for b in range(blocks):
            tvp = f"layer{stage}.{b}"
            ours = f"layer{stage}_block{b}"
            for ci in (1, 2, 3):
                flat[(ours, f"conv{ci}", "kernel")] = conv_w(f"{tvp}.conv{ci}.weight")
                for k, v in bn(f"{tvp}.bn{ci}").items():
                    flat[(ours, f"bn{ci}", k)] = v
            if f"{tvp}.downsample.0.weight" in sd:
                flat[(ours, "downsample_conv", "kernel")] = conv_w(f"{tvp}.downsample.0.weight")
                for k, v in bn(f"{tvp}.downsample.1").items():
                    flat[(ours, "downsample_bn", k)] = v
    params = {"params": unflatten_dict(flat)}

    # torchvision uses stride-in-3x3 (torch "ResNet v1.5")
    m = ResNet(depths=(3, 4, 6, 3), stride_in_1x1=False)
    outs = m.apply(params, jnp.asarray(x_np))

    with torch.no_grad():
        t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        t = tv.maxpool(tv.relu(tv.bn1(tv.conv1(t))))
        t = tv.layer1(t); c2 = t
        t = tv.layer2(t); c3 = t
        t = tv.layer3(t); c4 = t
        t = tv.layer4(t); c5 = t
    for ours_o, tv_o in zip(outs, (c2, c3, c4, c5)):
        np.testing.assert_allclose(
            np.asarray(ours_o), tv_o.numpy().transpose(0, 2, 3, 1), atol=2e-3
        )
