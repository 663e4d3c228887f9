"""Manual exact-parity check in float64 (slow to compile; run on demand):

    JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 python tests/_f64_check.py

Expected: max abs diffs at f64 rounding level (<1e-12), proving the JAX
towers are semantically identical to the torch reference and all f32
test-suite deltas are pure rounding noise.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import torch
import jax
import jax.numpy as jnp

from clip_embedder_tpu.models import text_transformer, vit
from clip_embedder_tpu.models.text_transformer import TextCfgResolved
from clip_embedder_tpu.models.vit import ViTCfg
from clip_embedder_tpu.weights import map_state_dict
from torch_ref import TextTransformer, TimmSiglipViT, VisionTransformer

torch.manual_seed(0)


def f64tree(p):
    return jax.tree.map(lambda a: jnp.asarray(np.asarray(a), dtype=jnp.float64), p)


def main():
    tm = VisionTransformer(16, 8, 32, 2, 4, 64, 24).double().eval()
    cfg = ViTCfg(image_size=16, patch_size=8, width=32, layers=2, heads=4,
                 mlp_hidden=64, embed_dim=24)
    params = f64tree(map_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()},
        tower="visual", family="vit"))
    x = torch.randn(2, 3, 16, 16).double()
    ref = tm(x).detach().numpy()
    got = np.asarray(vit.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), cfg))
    print("clip-vit f64 max diff:", np.abs(got - ref).max(), flush=True)

    tt = TextTransformer(8, 50, 32, 4, 2, 64, 24).double().eval()
    tcfg = TextCfgResolved(context_length=8, vocab_size=50, width=32, heads=4,
                           layers=2, mlp_hidden=64, embed_dim=24)
    tp = f64tree(map_state_dict(
        {k: v.numpy() for k, v in tt.state_dict().items()},
        tower="text", family="text_transformer"))
    ids = torch.randint(1, 49, (3, 8))
    ids[:, 0] = 49
    ref = tt(ids).detach().numpy()
    got = np.asarray(text_transformer.apply(tp, jnp.asarray(ids.numpy()), tcfg))
    print("clip-text f64 max diff:", np.abs(got - ref).max(), flush=True)

    sm = TimmSiglipViT(16, 8, 32, 2, 4, 64).double().eval()
    scfg = ViTCfg(image_size=16, patch_size=8, width=32, layers=2, heads=4,
                  mlp_hidden=64, embed_dim=32, activation="gelu_tanh",
                  use_class_token=False, use_ln_pre=False, pool="map",
                  use_proj=False, ln_eps=1e-6, pos_embed_cls=False)
    sp = f64tree(map_state_dict(
        {f"trunk.{k}": v.numpy() for k, v in sm.state_dict().items()},
        tower="visual", family="vit"))
    x = torch.randn(2, 3, 16, 16).double()
    ref = sm(x).detach().numpy()
    got = np.asarray(vit.apply(sp, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), scfg))
    print("siglip-vit f64 max diff:", np.abs(got - ref).max(), flush=True)


if __name__ == "__main__":
    main()
