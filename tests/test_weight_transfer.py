"""Forward-output parity with the torch reference via weight transfer.

The strongest architecture check: initialize the torch reference models,
transplant their weights into our flax models (layout-converted), and compare
forward outputs at f64. This pins layer ordering, concat orders, patchify
layouts, norm semantics, and activation choices — beyond what parameter
counts can show.
"""

import numpy as np
import numpy.testing as npt
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from bsi_tpu.models import DenoisingDiT, DenoisingMLP, DenoisingVDMUNet
from bsi_tpu.nn import FourierFeatures, NyquistPositionalEmbedding, repack_qkv_grouped


def t2j(x):
    return jnp.asarray(x.detach().cpu().numpy())


def linear(mod):
    return {"kernel": t2j(mod.weight).T, "bias": t2j(mod.bias)}


def conv(mod):
    # torch OIHW -> flax HWIO
    return {"kernel": t2j(mod.weight).transpose(2, 3, 1, 0), "bias": t2j(mod.bias)}


def groupnorm(mod):
    return {"scale": t2j(mod.weight), "bias": t2j(mod.bias)}


def qkv(converted: dict, heads: int) -> dict:
    """Repack a converted qkv projection from the reference's (qkv h c)
    output layout to our grouped (g qkv x) layout (bsi_tpu/nn/attention)."""
    return {k: repack_qkv_grouped(v, heads) for k, v in converted.items()}


def make_double(build):
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.double)
    try:
        return build().double().eval()
    finally:
        torch.set_default_dtype(prev)


def test_mlp_forward_parity():
    from bsi.models.mlp import DenoisingMLP as RefMLP
    from bsi.models.pos_emb import NyquistPositionalEmbedding as RefEmb
    from bsi.nn import FourierFeatures as RefFF

    data_shape = (8,)
    ref = make_double(
        lambda: RefMLP(
            data_shape=data_shape, pos_emb=RefEmb(16, 100), hidden_width=32,
            layers=2, actfn="silu", zero_init=False,
            fourier_features=RefFF(n_min=6, n_max=8),
        )
    )
    ours = DenoisingMLP(
        data_shape=data_shape, pos_emb=NyquistPositionalEmbedding(16, 100),
        hidden_width=32, layers=2, actfn="silu",
        fourier_features=FourierFeatures(n_min=6, n_max=8),
    )
    params = {
        "params": {
            "trunk": {
                "Dense_0": linear(ref.layers[0]),
                "Dense_1": linear(ref.layers[2]),
            },
            "head": linear(ref.layers[4]),
        }
    }

    rng = np.random.default_rng(0)
    mu = rng.normal(size=(4,) + data_shape)
    t = rng.uniform(0, 1, size=(4,))
    got = np.asarray(ours.apply(params, jnp.asarray(mu), jnp.asarray(t)))
    want = ref(torch.tensor(mu), torch.tensor(t)).detach().numpy()
    npt.assert_allclose(got, want, atol=5e-5)  # f32 pos-emb constants dominate


def test_dit_forward_parity():
    from bsi.models.dit import DenoisingDiT as RefDiT
    from bsi.nn import FourierFeatures as RefFF

    H = W = 8
    ref = make_double(
        lambda: RefDiT(
            data_shape=(3, H, W), patch_size=2, dim=32, depth=2, heads=2,
            dropout=None, fourier_features=RefFF(n_min=6, n_max=8),
        )
    )
    ours = DenoisingDiT(
        data_shape=(H, W, 3), patch_size=2, dim=32, depth=2, heads=2,
        fourier_features=FourierFeatures(n_min=6, n_max=8),
    )

    blocks = {}
    for i, blk in enumerate(ref.dit.blocks):
        blocks[f"block_{i}"] = {
            "ada_in": linear(blk.adaLN_modulation[0]),
            "ada_out": linear(blk.adaLN_modulation[2]),
            "attn": {"to_qkv": qkv(linear(blk.attn.to_qkv), 2), "to_out": linear(blk.attn.to_out)},
            "mlp": {"Dense_0": linear(blk.mlp[0]), "Dense_1": linear(blk.mlp[2])},
        }
    params = {
        "params": {
            "dit": {
                "patch_encoder": linear(ref.dit.patch_encoder),
                "decoder_norm": {
                    "scale": t2j(ref.dit.patch_decoder[0].weight),
                    "bias": t2j(ref.dit.patch_decoder[0].bias),
                },
                "patch_decoder": linear(ref.dit.patch_decoder[1]),
                **blocks,
            }
        }
    }

    rng = np.random.default_rng(1)
    mu_nchw = rng.normal(size=(4, 3, H, W))
    t = rng.uniform(0, 1, size=(4,))
    got = np.asarray(
        ours.apply(params, jnp.asarray(mu_nchw.transpose(0, 2, 3, 1)), jnp.asarray(t))
    )
    want = ref(torch.tensor(mu_nchw), torch.tensor(t)).detach().numpy()
    npt.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=5e-5)


def test_unet_forward_parity():
    from bsi.models.pos_emb import NyquistPositionalEmbedding as RefEmb
    from bsi.models.vdm_unet import DenoisingVDMUNet as RefUNet
    from bsi.nn import FourierFeatures as RefFF

    H = W = 8
    levels = 2
    ref = make_double(
        lambda: RefUNet(
            data_shape=(3, H, W), pos_emb=RefEmb(16, 100), actfn="silu", dim=32,
            levels=levels, pos_emb_mult=4, n_attention_heads=2, dropout=None,
            downsampling_attention=False,
            fourier_features=RefFF(n_min=6, n_max=8),
        )
    )
    ours = DenoisingVDMUNet(
        data_shape=(H, W, 3), pos_emb=NyquistPositionalEmbedding(16, 100),
        actfn="silu", dim=32, levels=levels, pos_emb_mult=4, n_attention_heads=2,
        fourier_features=FourierFeatures(n_min=6, n_max=8),
    )

    def res_block(blk):
        out = {
            "to_scale_shift": linear(blk.project_onto_scale_shift),
            "GroupNorm_0": groupnorm(blk.layers[0]),
            "conv1": conv(blk.layers[2]),
            "conv2": conv(blk.layers[5]),
        }
        if not isinstance(blk.skip, torch.nn.Identity):
            out["skip"] = conv(blk.skip)
        return out

    unet = {}
    for i in range(levels):
        unet[f"down_{i}"] = res_block(ref.u_net.downsampling_blocks[i][0])
        unet[f"up_{i}"] = res_block(ref.u_net.upsampling_blocks[i][0])
    unet["center_in"] = res_block(ref.u_net.center_block[0])
    attn_res = ref.u_net.center_block[1].fn
    unet["GroupNorm_0"] = groupnorm(attn_res[0])
    unet["Attention2D_0"] = {
        "to_qkv": qkv(conv(attn_res[1].to_qkv), 2),
        "to_out": conv(attn_res[1].to_out),
    }
    unet["center_out"] = res_block(ref.u_net.center_block[2])

    params = {
        "params": {
            "pos_map_1": linear(ref.pos_map[1]),
            "pos_map_2": linear(ref.pos_map[3]),
            "encode": conv(ref.encode),
            "decode": conv(ref.decode),
            "unet": unet,
        }
    }

    rng = np.random.default_rng(2)
    mu_nchw = rng.normal(size=(2, 3, H, W))
    t = rng.uniform(0, 1, size=(2,))
    got = np.asarray(
        ours.apply(params, jnp.asarray(mu_nchw.transpose(0, 2, 3, 1)), jnp.asarray(t))
    )
    want = ref(torch.tensor(mu_nchw), torch.tensor(t)).detach().numpy()
    npt.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=5e-5)
