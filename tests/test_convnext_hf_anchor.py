"""ConvNeXt anchored on a third-party implementation: map a real
``transformers.ConvNextModel`` checkpoint (random-init, tiny) onto our
pytree and require end-to-end parity. Unlike the self-written torch mirror
in test_convnext.py, this validates block semantics (dwconv → LN → pw1 →
gelu → pw2 → layer-scale → residual), downsample order (LN before conv),
and the pooled-LN head against code we didn't write."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

transformers = pytest.importorskip("transformers")

from clip_embedder_tpu.models import convnext  # noqa: E402
from clip_embedder_tpu.models.convnext import (  # noqa: E402
    ConvNeXtCfg,
    map_convnext_visual,
)


def _to_timm_names(sd):
    out = {}
    for k, v in sd.items():
        k = k.replace("convnext.", "")
        if k in ("layernorm.weight", "layernorm.bias"):  # final (pooler) LN
            out[k.replace("layernorm", "head.norm")] = v.numpy()
            continue
        k = k.replace("embeddings.patch_embeddings", "stem.0")
        k = k.replace("embeddings.layernorm", "stem.1")
        k = k.replace("encoder.stages.", "stages.")
        k = k.replace(".downsampling_layer.0", ".downsample.0")
        k = k.replace(".downsampling_layer.1", ".downsample.1")
        k = k.replace(".layers.", ".blocks.")
        k = k.replace(".dwconv", ".conv_dw")
        k = k.replace(".layernorm", ".norm")
        k = k.replace(".pwconv1", ".mlp.fc1")
        k = k.replace(".pwconv2", ".mlp.fc2")
        k = k.replace(".layer_scale_parameter", ".gamma")
        if k == "norm.weight":
            k = "head.norm.weight"
        elif k == "norm.bias":
            k = "head.norm.bias"
        out[k] = v.numpy()
    return out


def test_convnext_matches_transformers_convnextmodel():
    torch.manual_seed(0)
    cfg_hf = transformers.ConvNextConfig(
        num_channels=3, patch_size=4, hidden_sizes=[16, 32, 64, 128],
        depths=[1, 1, 2, 1], hidden_act="gelu", layer_norm_eps=1e-6,
        image_size=32,
    )
    model = transformers.ConvNextModel(cfg_hf).eval()
    params = map_convnext_visual(_to_timm_names(model.state_dict()))

    cfg = ConvNeXtCfg(image_size=32, embed_dim=128,
                      depths=(1, 1, 2, 1), dims=(16, 32, 64, 128),
                      proj="none")
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = model(x).pooler_output.numpy()  # layernorm(mean(H,W))
    got = np.asarray(convnext.apply(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), cfg,
        normalize=False))
    np.testing.assert_allclose(got, ref, atol=3e-5)
