"""Diffusion Transformer (DiT) denoiser.

TPU-native DiT (arXiv:2212.09748) with the reference's two deliberate
deviations from upstream DiT (bsi/models/dit.py:1-10): an extra Dense in
front of the SiLU when computing the adaLN modulation (so blocks do not all
modulate the same t-embedding), and dropout before the block MLP.

Design choices for TPU:
- NHWC data; patchify/unpatchify are pure reshape/transpose (free for XLA).
- Fixed (non-learned) 2D positional embeddings built from two 1D
  Nyquist embeddings — compile-time constants, no parameter traffic.
- Attention via :func:`bsi_tpu.ops.multi_head_attention` (Pallas fused
  kernel on the no-dropout path).
"""

from __future__ import annotations

import re

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from bsi_tpu.nn import MLP, FourierFeatures, NyquistPositionalEmbedding, TokenAttention
from bsi_tpu.ops import layernorm_modulate

_BLOCK_RE = re.compile(r"^block_\d+$")


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """adaLN modulation over tokens: ``shift + (scale + 1) * x``."""
    return shift[:, None, :] + (scale[:, None, :] + 1.0) * x


class DiTBlock(nn.Module):
    """DiT block with adaptive layer norm zero (adaLN-Zero) conditioning.

    ``token_sharding`` (a NamedSharding for the [B, S, D] token stream with
    the SEQUENCE dim on the mesh's model axis) turns on Megatron-style
    sequence parallelism: the residual stream, both fused LayerNorms, and the
    dropout run sharded over tokens; XLA inserts the all-gather before each
    matmul pair and turns the pair's output all-reduce into a reduce-scatter
    (see bsi_tpu/parallel/sequence.py)."""

    heads: int
    mlp_ratio: int = 4
    dropout: float | None = None
    dtype: jnp.dtype | None = None
    token_sharding: object | None = None

    def _sp(self, v: jnp.ndarray) -> jnp.ndarray:
        if self.token_sharding is None:
            return v
        return jax.lax.with_sharding_constraint(v, self.token_sharding)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, c: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        size = x.shape[-1]
        # adaLN-Zero: the final Dense is zero-initialized so each block starts
        # as the identity
        h = nn.silu(nn.Dense(size, dtype=self.dtype, name="ada_in")(c))
        mod = nn.Dense(
            6 * size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="ada_out",
        )(h)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
            mod, 6, axis=-1
        )

        # LayerNorm + modulate fused in one HBM pass (Pallas on TPU; both
        # norms are statistics-only, so there are no LN params to thread)
        x = self._sp(x)
        attn_in = self._sp(layernorm_modulate(x, shift_msa, scale_msa))
        attn_out = TokenAttention(
            heads=self.heads, dropout=self.dropout or 0.0, dtype=self.dtype, name="attn"
        )(attn_in, deterministic=deterministic)
        # Named so a remat policy COULD save the attention output. Measured
        # on DiT-L/2 b64 v5e: the dots-saveable policy re-runs the attention
        # forward in backward (24 extra kernel calls/step), but saving it
        # (+800 MB activations) made the step 2.6% SLOWER — the extra HBM
        # pressure triggers more XLA auto-remat than the recompute costs.
        # So the default policy stays dots-only; the name remains as a hook.
        attn_out = checkpoint_name(attn_out, "attn_out")
        x = self._sp(x + gate_msa[:, None, :] * attn_out)

        mlp_in = self._sp(layernorm_modulate(x, shift_mlp, scale_mlp))
        if self.dropout is not None:
            mlp_in = nn.Dropout(self.dropout, deterministic=deterministic)(mlp_in)
        mlp_out = MLP(
            out_features=size,
            hidden_features=[self.mlp_ratio * size],
            actfn=lambda v: nn.gelu(v, approximate=True),
            dtype=self.dtype,
            name="mlp",
        )(mlp_in)
        return self._sp(x + gate_mlp[:, None, :] * mlp_out)


class _BlockScanBody(nn.Module):
    """Scan body wrapping one DiTBlock: returns ``(carry, None)`` as
    ``nn.scan`` requires. Parameters live under ``<scan>/block`` with a
    leading ``depth`` axis — the stacked layout pipeline parallelism shards
    over the ``pipe`` mesh axis (bsi_tpu/parallel/pipeline.py)."""

    heads: int
    mlp_ratio: int = 4
    dropout: float | None = None
    dtype: jnp.dtype | None = None
    token_sharding: object | None = None

    @nn.compact
    def __call__(self, tokens, c, deterministic: bool = True):
        tokens = DiTBlock(
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            dropout=self.dropout,
            dtype=self.dtype,
            token_sharding=self.token_sharding,
            name="block",
        )(tokens, c, deterministic)
        return tokens, None


class DiT(nn.Module):
    """Transformer over image patches with adaLN-Zero t-conditioning.

    ``scan_blocks=True`` stores the blocks as ONE stacked module (leaves
    gain a leading ``depth`` axis, applied via ``nn.scan``) instead of
    ``depth`` named submodules. Same math; required for pipeline
    parallelism, where the leading axis shards over the ``pipe`` mesh axis.
    Convert between the layouts with :func:`stack_block_params` /
    :func:`unstack_block_params`.
    """

    input_size: tuple[int, int]
    patch_size: int
    out_channels: int
    hidden_size: int
    depth: int
    heads: int
    mlp_ratio: int = 4
    dropout: float | None = None
    remat: bool = False
    scan_blocks: bool = False
    dtype: jnp.dtype | None = None
    # NamedSharding for the [B, S, D] token stream (seq on the model axis)
    # enabling sequence parallelism; see bsi_tpu/parallel/sequence.py.
    token_sharding: object | None = None

    def _pos_embedding(self) -> np.ndarray:
        """Fixed 2D positional embedding: concat of per-row and per-column 1D
        Nyquist embeddings, h-major patch order."""
        height, width = self.input_size
        ph, pw = height // self.patch_size, width // self.patch_size
        emb = NyquistPositionalEmbedding(self.hidden_size // 2, max(height, width))
        pos_h = emb.table(np.linspace(0.0, 1.0, ph))  # [ph, hidden/2]
        pos_w = emb.table(np.linspace(0.0, 1.0, pw))  # [pw, hidden/2]
        rows = np.repeat(pos_h, pw, axis=0)  # [(ph pw), hidden/2]
        cols = np.tile(pos_w, (ph, 1))  # [(ph pw), hidden/2]
        return np.concatenate([rows, cols], axis=1)

    def setup(self):
        # Attribute names double as parameter-tree names, so the tree is
        # identical to the previous @nn.compact layout.
        self.patch_encoder = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.decoder_norm = nn.LayerNorm(dtype=self.dtype)
        self.patch_decoder = nn.Dense(
            self.patch_size * self.patch_size * self.out_channels, dtype=self.dtype
        )
        # Rematerialization trades FLOPs for activation memory to fit DiT-L at
        # large batch on one chip. The dots-saveable policy keeps matmul
        # outputs and recomputes only the cheap elementwise tail — measured
        # 49% faster than full recompute on v5e (123 vs 83 ex/s, DiT-L/2 b64)
        policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        if self.scan_blocks:
            body = (
                nn.remat(_BlockScanBody, static_argnums=(3,), policy=policy)
                if self.remat
                else _BlockScanBody
            )
            self.blocks = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.depth,
            )(
                heads=self.heads,
                mlp_ratio=self.mlp_ratio,
                dropout=self.dropout,
                dtype=self.dtype,
                token_sharding=self.token_sharding,
            )
        else:
            block_cls = (
                nn.remat(DiTBlock, static_argnums=(3,), policy=policy)
                if self.remat
                else DiTBlock
            )
            # list attribute -> names "block_0", "block_1", ...
            self.block = [
                block_cls(
                    heads=self.heads,
                    mlp_ratio=self.mlp_ratio,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    token_sharding=self.token_sharding,
                )
                for _ in range(self.depth)
            ]

    def embed(self, x: jnp.ndarray, t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Patchify + encode + fixed positional embedding; t-conditioning
        vector. Runs outside the pipeline (replicated over ``pipe``)."""
        b, h, w, c_in = x.shape
        p = self.patch_size
        ph, pw = h // p, w // p

        # Patchify: [B, H, W, C] -> [B, (ph pw), (p p C)]
        patches = x.reshape(b, ph, p, pw, p, c_in)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph * pw, p * p * c_in)

        tokens = self.patch_encoder(patches)
        tokens = tokens + jnp.asarray(self._pos_embedding(), tokens.dtype)
        if self.token_sharding is not None:
            tokens = jax.lax.with_sharding_constraint(tokens, self.token_sharding)
        c = NyquistPositionalEmbedding(self.hidden_size, 1000)(t)
        return tokens, c

    def run_blocks(
        self, tokens: jnp.ndarray, c: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        if self.scan_blocks:
            tokens, _ = self.blocks(tokens, c, deterministic)
            return tokens
        for blk in self.block:
            tokens = blk(tokens, c, deterministic)
        return tokens

    def decode(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """LayerNorm + linear decode + unpatchify."""
        b = tokens.shape[0]
        h, w = self.input_size
        p = self.patch_size
        ph, pw = h // p, w // p
        if self.token_sharding is not None:
            # decoder norm + linear run token-sharded; the unpatchify below
            # forces the (single) final all-gather of the stream
            tokens = jax.lax.with_sharding_constraint(tokens, self.token_sharding)
        tokens = self.decoder_norm(tokens)
        out = self.patch_decoder(tokens)
        # Unpatchify: [B, (ph pw), (p p C)] -> [B, H, W, C]
        out = out.reshape(b, ph, pw, p, p, self.out_channels)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, self.out_channels)

    def __call__(
        self, x: jnp.ndarray, t: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        tokens, c = self.embed(x, t)
        tokens = self.run_blocks(tokens, c, deterministic)
        return self.decode(tokens)


class DenoisingDiT(nn.Module):
    """DiT conforming to the uniform ``(mu, t) -> prediction`` denoiser
    contract, with optional per-channel Fourier features on the input
    (reference: bsi/models/dit.py:184-233)."""

    data_shape: tuple[int, int, int]  # (H, W, C)
    patch_size: int
    dim: int
    depth: int
    heads: int
    mlp_ratio: int = 4
    dropout: float | None = None
    remat: bool = False
    scan_blocks: bool = False
    fourier_features: FourierFeatures | None = None
    dtype: jnp.dtype | None = None
    token_sharding: object | None = None

    def setup(self):
        if len(self.data_shape) != 3:
            raise ValueError("DenoisingDiT only supports 2D image data (H, W, C)")
        self.dit = DiT(
            input_size=self.data_shape[:2],
            patch_size=self.patch_size,
            out_channels=self.data_shape[-1],
            hidden_size=self.dim,
            depth=self.depth,
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            dropout=self.dropout,
            remat=self.remat,
            scan_blocks=self.scan_blocks,
            dtype=self.dtype,
            token_sharding=self.token_sharding,
        )

    def _features(self, mu: jnp.ndarray) -> jnp.ndarray:
        if self.fourier_features is not None:
            return jnp.concatenate([mu, self.fourier_features(mu)], axis=-1)
        return mu

    def embed(self, mu: jnp.ndarray, t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        return self.dit.embed(self._features(mu), t)

    def decode(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.dit.decode(tokens)

    def __call__(
        self, mu: jnp.ndarray, t: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        return self.dit(self._features(mu), t, deterministic=deterministic)


def stack_block_params(params, depth: int):
    """Convert a loop-layout DiT param tree (``block_0`` ... ``block_{n-1}``)
    to the scan layout (``blocks/block`` with a leading depth axis).

    The loop layout is the interchange format (it is what the torch
    weight-transfer converters produce, tests/test_weight_transfer.py); the
    scan layout is what pipeline parallelism shards. Works on the full
    ``{'params': ...}`` tree of a DenoisingDiT or bare DiT."""
    import jax as _jax

    def convert(tree):
        if not isinstance(tree, dict):
            return tree
        if "block_0" in tree:
            rest = {k: v for k, v in tree.items() if not _BLOCK_RE.match(k)}
            layers = [tree[f"block_{i}"] for i in range(depth)]
            rest["blocks"] = {
                "block": _jax.tree.map(lambda *ls: jnp.stack(ls, axis=0), *layers)
            }
            return rest
        return {k: convert(v) for k, v in tree.items()}

    return convert(params)


def unstack_block_params(params):
    """Inverse of :func:`stack_block_params`: scan layout -> loop layout."""
    import jax as _jax

    def convert(tree):
        if not isinstance(tree, dict):
            return tree
        if "blocks" in tree and isinstance(tree["blocks"], dict) and "block" in tree["blocks"]:
            rest = {k: v for k, v in tree.items() if k != "blocks"}
            stacked = tree["blocks"]["block"]
            depth = _jax.tree.leaves(stacked)[0].shape[0]
            for i in range(depth):
                rest[f"block_{i}"] = _jax.tree.map(lambda l: l[i], stacked)
            return rest
        return {k: convert(v) for k, v in tree.items()}

    return convert(params)


def _convert_state_layout(state, convert):
    """Apply a block-layout converter to every params-shaped tree a TrainState
    carries: the model params, the EMA params, and the optimizer moments
    (optax's mu/nu mirror the param structure, so a layout change must walk
    through the NamedTuple chain state too)."""

    def rec(obj):
        if isinstance(obj, dict):
            return convert(obj)
        if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # NamedTuple
            return type(obj)(*(rec(v) for v in obj))
        if isinstance(obj, tuple):
            return tuple(rec(v) for v in obj)
        if isinstance(obj, list):
            return [rec(v) for v in obj]
        return obj

    return state.replace(
        params=convert(state.params),
        ema_params=convert(state.ema_params),
        opt_state=rec(state.opt_state),
    )


def stack_state_blocks(state, depth: int):
    """Convert a full TrainState from the loop block layout to the scan
    layout — the cross-layout restore path: a checkpoint trained (or
    weight-transferred from torch) in the loop layout can resume under
    pipeline parallelism, which shards stacked blocks
    (bsi_tpu/parallel/pipeline.py). Covers params, EMA params, and the Adam
    moments; ``tests/test_sharded_checkpoint.py`` pins trajectory equality
    across the conversion."""
    return _convert_state_layout(state, lambda t: stack_block_params(t, depth))


def unstack_state_blocks(state):
    """Inverse of :func:`stack_state_blocks`: scan-layout TrainState -> loop."""
    return _convert_state_layout(state, unstack_block_params)
