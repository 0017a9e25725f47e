"""InceptionV3 (FID variant) as a pure JAX function.

The reference relies on torchmetrics' pretrained ``NoTrainInceptionV3``
(pytorch-fid's pt_inception-2015-12-05 network) for FID embeddings
(bsi/tasks/metrics/fid.py:20-84). This module reimplements that exact
architecture — including the FID variants' ``count_include_pad=False``
average pooling and the max-pool branch in Mixed_7c — as a parameter-dict
pure function, with a converter from a torch state dict so the official
weights drop in unchanged.

Input convention: uint8 NHWC images; the embed function scales to [0, 1],
resizes to 299x299 bilinear (half-pixel centers, matching
``F.interpolate(align_corners=False)``), rescales to [-1, 1], and returns
the 2048-d pooled features.

Weights: pass a path to a torch checkpoint of the pt_inception network
(e.g. ``pt_inception-2015-12-05-6726825d.pth``) or a converted ``.npz``.
This environment has no network egress, so weight files must be provided;
everything else (stats accumulation, distance, schedules) works without.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax.linen import avg_pool, max_pool

BN_EPS = 1e-3


# --------------------------------------------------------------- primitives


def _conv(params: Mapping, name: str, x: jnp.ndarray, *, stride=1, padding=((0, 0), (0, 0))):
    w = params[f"{name}.conv.weight"]  # HWIO
    s = (stride, stride) if isinstance(stride, int) else stride
    x = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), s, padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    scale = params[f"{name}.bn.weight"]
    bias = params[f"{name}.bn.bias"]
    mean = params[f"{name}.bn.running_mean"]
    var = params[f"{name}.bn.running_var"]
    inv = scale / jnp.sqrt(var + BN_EPS)
    x = x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype)
    return jax.nn.relu(x)


def _pad(k: int) -> tuple:
    return ((k, k), (k, k))


_P0 = ((0, 0), (0, 0))
_P1 = _pad(1)
_P2 = _pad(2)
_P_1x7 = ((0, 0), (3, 3))
_P_7x1 = ((3, 3), (0, 0))
_P_1x3 = ((0, 0), (1, 1))
_P_3x1 = ((1, 1), (0, 0))


def _avg3(x):
    # count_include_pad=False (the FID-variant pooling)
    return avg_pool(x, (3, 3), strides=(1, 1), padding=_P1, count_include_pad=False)


def _max3s2(x):
    return max_pool(x, (3, 3), strides=(2, 2))


# ------------------------------------------------------------------- blocks


def _inception_a(p, n, x):
    b1 = _conv(p, f"{n}.branch1x1", x)
    b5 = _conv(p, f"{n}.branch5x5_2", _conv(p, f"{n}.branch5x5_1", x), padding=_P2)
    b3 = _conv(p, f"{n}.branch3x3dbl_1", x)
    b3 = _conv(p, f"{n}.branch3x3dbl_2", b3, padding=_P1)
    b3 = _conv(p, f"{n}.branch3x3dbl_3", b3, padding=_P1)
    bp = _conv(p, f"{n}.branch_pool", _avg3(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, n, x):
    b3 = _conv(p, f"{n}.branch3x3", x, stride=2)
    bd = _conv(p, f"{n}.branch3x3dbl_1", x)
    bd = _conv(p, f"{n}.branch3x3dbl_2", bd, padding=_P1)
    bd = _conv(p, f"{n}.branch3x3dbl_3", bd, stride=2)
    return jnp.concatenate([b3, bd, _max3s2(x)], axis=-1)


def _inception_c(p, n, x):
    b1 = _conv(p, f"{n}.branch1x1", x)
    b7 = _conv(p, f"{n}.branch7x7_1", x)
    b7 = _conv(p, f"{n}.branch7x7_2", b7, padding=_P_1x7)
    b7 = _conv(p, f"{n}.branch7x7_3", b7, padding=_P_7x1)
    bd = _conv(p, f"{n}.branch7x7dbl_1", x)
    bd = _conv(p, f"{n}.branch7x7dbl_2", bd, padding=_P_7x1)
    bd = _conv(p, f"{n}.branch7x7dbl_3", bd, padding=_P_1x7)
    bd = _conv(p, f"{n}.branch7x7dbl_4", bd, padding=_P_7x1)
    bd = _conv(p, f"{n}.branch7x7dbl_5", bd, padding=_P_1x7)
    bp = _conv(p, f"{n}.branch_pool", _avg3(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, n, x):
    b3 = _conv(p, f"{n}.branch3x3_2", _conv(p, f"{n}.branch3x3_1", x), stride=2)
    b7 = _conv(p, f"{n}.branch7x7x3_1", x)
    b7 = _conv(p, f"{n}.branch7x7x3_2", b7, padding=_P_1x7)
    b7 = _conv(p, f"{n}.branch7x7x3_3", b7, padding=_P_7x1)
    b7 = _conv(p, f"{n}.branch7x7x3_4", b7, stride=2)
    return jnp.concatenate([b3, b7, _max3s2(x)], axis=-1)


def _inception_e(p, n, x, *, pool: str):
    b1 = _conv(p, f"{n}.branch1x1", x)
    b3 = _conv(p, f"{n}.branch3x3_1", x)
    b3 = jnp.concatenate(
        [
            _conv(p, f"{n}.branch3x3_2a", b3, padding=_P_1x3),
            _conv(p, f"{n}.branch3x3_2b", b3, padding=_P_3x1),
        ],
        axis=-1,
    )
    bd = _conv(p, f"{n}.branch3x3dbl_1", x)
    bd = _conv(p, f"{n}.branch3x3dbl_2", bd, padding=_P1)
    bd = jnp.concatenate(
        [
            _conv(p, f"{n}.branch3x3dbl_3a", bd, padding=_P_1x3),
            _conv(p, f"{n}.branch3x3dbl_3b", bd, padding=_P_3x1),
        ],
        axis=-1,
    )
    if pool == "avg":
        pooled = _avg3(x)
    else:  # Mixed_7c uses max pooling in the FID network
        pooled = max_pool(x, (3, 3), strides=(1, 1), padding=_P1)
    bp = _conv(p, f"{n}.branch_pool", pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ------------------------------------------------------------------ forward


def inception_features(params: Mapping, x01: jnp.ndarray) -> jnp.ndarray:
    """2048-d FID features from float images ``[N, H, W, 3]`` in [0, 1]."""
    x = jax.image.resize(x01, (x01.shape[0], 299, 299, 3), method="bilinear")
    x = 2.0 * x - 1.0

    x = _conv(params, "Conv2d_1a_3x3", x, stride=2)
    x = _conv(params, "Conv2d_2a_3x3", x)
    x = _conv(params, "Conv2d_2b_3x3", x, padding=_P1)
    x = _max3s2(x)
    x = _conv(params, "Conv2d_3b_1x1", x)
    x = _conv(params, "Conv2d_4a_3x3", x)
    x = _max3s2(x)
    x = _inception_a(params, "Mixed_5b", x)
    x = _inception_a(params, "Mixed_5c", x)
    x = _inception_a(params, "Mixed_5d", x)
    x = _inception_b(params, "Mixed_6a", x)
    x = _inception_c(params, "Mixed_6b", x)
    x = _inception_c(params, "Mixed_6c", x)
    x = _inception_c(params, "Mixed_6d", x)
    x = _inception_c(params, "Mixed_6e", x)
    x = _inception_d(params, "Mixed_7a", x)
    x = _inception_e(params, "Mixed_7b", x, pool="avg")
    x = _inception_e(params, "Mixed_7c", x, pool="max")
    return x.mean(axis=(1, 2))


# ------------------------------------------------------------------- params


def _conv_specs() -> list[tuple[str, int, int, tuple[int, int]]]:
    """(name, c_in, c_out, (kh, kw)) for every BasicConv2d in the network."""
    specs: list[tuple[str, int, int, tuple[int, int]]] = []

    def c(name, cin, cout, k):
        specs.append((name, cin, cout, (k, k) if isinstance(k, int) else k))

    c("Conv2d_1a_3x3", 3, 32, 3)
    c("Conv2d_2a_3x3", 32, 32, 3)
    c("Conv2d_2b_3x3", 32, 64, 3)
    c("Conv2d_3b_1x1", 64, 80, 1)
    c("Conv2d_4a_3x3", 80, 192, 3)

    def block_a(n, cin, pool):
        c(f"{n}.branch1x1", cin, 64, 1)
        c(f"{n}.branch5x5_1", cin, 48, 1)
        c(f"{n}.branch5x5_2", 48, 64, 5)
        c(f"{n}.branch3x3dbl_1", cin, 64, 1)
        c(f"{n}.branch3x3dbl_2", 64, 96, 3)
        c(f"{n}.branch3x3dbl_3", 96, 96, 3)
        c(f"{n}.branch_pool", cin, pool, 1)

    def block_b(n, cin):
        c(f"{n}.branch3x3", cin, 384, 3)
        c(f"{n}.branch3x3dbl_1", cin, 64, 1)
        c(f"{n}.branch3x3dbl_2", 64, 96, 3)
        c(f"{n}.branch3x3dbl_3", 96, 96, 3)

    def block_c(n, cin, c7):
        c(f"{n}.branch1x1", cin, 192, 1)
        c(f"{n}.branch7x7_1", cin, c7, 1)
        c(f"{n}.branch7x7_2", c7, c7, (1, 7))
        c(f"{n}.branch7x7_3", c7, 192, (7, 1))
        c(f"{n}.branch7x7dbl_1", cin, c7, 1)
        c(f"{n}.branch7x7dbl_2", c7, c7, (7, 1))
        c(f"{n}.branch7x7dbl_3", c7, c7, (1, 7))
        c(f"{n}.branch7x7dbl_4", c7, c7, (7, 1))
        c(f"{n}.branch7x7dbl_5", c7, 192, (1, 7))
        c(f"{n}.branch_pool", cin, 192, 1)

    def block_d(n, cin):
        c(f"{n}.branch3x3_1", cin, 192, 1)
        c(f"{n}.branch3x3_2", 192, 320, 3)
        c(f"{n}.branch7x7x3_1", cin, 192, 1)
        c(f"{n}.branch7x7x3_2", 192, 192, (1, 7))
        c(f"{n}.branch7x7x3_3", 192, 192, (7, 1))
        c(f"{n}.branch7x7x3_4", 192, 192, 3)

    def block_e(n, cin):
        c(f"{n}.branch1x1", cin, 320, 1)
        c(f"{n}.branch3x3_1", cin, 384, 1)
        c(f"{n}.branch3x3_2a", 384, 384, (1, 3))
        c(f"{n}.branch3x3_2b", 384, 384, (3, 1))
        c(f"{n}.branch3x3dbl_1", cin, 448, 1)
        c(f"{n}.branch3x3dbl_2", 448, 384, 3)
        c(f"{n}.branch3x3dbl_3a", 384, 384, (1, 3))
        c(f"{n}.branch3x3dbl_3b", 384, 384, (3, 1))
        c(f"{n}.branch_pool", cin, 192, 1)

    block_a("Mixed_5b", 192, 32)
    block_a("Mixed_5c", 256, 64)
    block_a("Mixed_5d", 288, 64)
    block_b("Mixed_6a", 288)
    block_c("Mixed_6b", 768, 128)
    block_c("Mixed_6c", 768, 160)
    block_c("Mixed_6d", 768, 160)
    block_c("Mixed_6e", 768, 192)
    block_d("Mixed_7a", 768)
    block_e("Mixed_7b", 1280)
    block_e("Mixed_7c", 2048)
    return specs


def random_params(rng: np.random.Generator | int = 0) -> dict[str, np.ndarray]:
    """Random weights with the exact architecture shapes (for tests)."""
    if isinstance(rng, int):
        rng = np.random.default_rng(rng)
    params: dict[str, np.ndarray] = {}
    for name, cin, cout, (kh, kw) in _conv_specs():
        params[f"{name}.conv.weight"] = rng.normal(
            0, 0.05, size=(kh, kw, cin, cout)
        ).astype(np.float32)
        params[f"{name}.bn.weight"] = np.ones(cout, np.float32)
        params[f"{name}.bn.bias"] = np.zeros(cout, np.float32)
        params[f"{name}.bn.running_mean"] = np.zeros(cout, np.float32)
        params[f"{name}.bn.running_var"] = np.ones(cout, np.float32)
    return params


def convert_torch_state_dict(state_dict: Mapping) -> dict[str, np.ndarray]:
    """Convert a pt_inception torch state dict to this module's param dict
    (OIHW conv weights -> HWIO; fc head and bookkeeping entries dropped)."""
    params: dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        if key.startswith("fc.") or key.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        if key.endswith("conv.weight"):
            arr = arr.transpose(2, 3, 1, 0)
        params[key] = arr.astype(np.float32)
    return params


def load_params(path: str | Path) -> dict[str, np.ndarray]:
    """Load network weights from a torch checkpoint (.pth/.pt) or .npz."""
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = obj.state_dict() if hasattr(obj, "state_dict") else obj
    return convert_torch_state_dict(state_dict)


def make_embed_fn(params: Mapping, *, dtype=jnp.float32):
    """Build a jitted uint8-NHWC -> 2048-d embedding function."""
    params = {k: jnp.asarray(v) for k, v in params.items()}

    @jax.jit
    def embed(images_uint8):
        x = images_uint8.astype(dtype) / 255.0
        return inception_features(params, x)

    return embed


@functools.lru_cache(maxsize=1)
def default_weights_path() -> Path | None:
    """Locate inception weights: $BSI_TPU_INCEPTION_WEIGHTS or data/."""
    import os

    env = os.environ.get("BSI_TPU_INCEPTION_WEIGHTS")
    candidates = [Path(env)] if env else []
    candidates += sorted(Path("data").glob("pt_inception*.pth")) + sorted(
        Path("data").glob("pt_inception*.npz")
    )
    for cand in candidates:
        if cand.exists():
            return cand
    return None
