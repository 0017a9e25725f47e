"""Persistent XLA compilation cache.

Big-model compiles are the dominant fixed cost of every entry point — on the
target TPU the DiT-L sampling program takes minutes to compile (and the
compile travels over a remote-compile RPC, so a dropped connection kills the
whole run). The persistent cache makes every compile after the first process
a disk hit; measured on the real chip: 147 s first Pallas compile in a fresh
process vs ~1 s with a warm cache.

The reference counterpart is torch.compile's inductor cache (implicit in
``~/.cache``); here the location is explicit so benchmark and CI runs can
share it (reference: /root/reference/bsi/tasks/task.py torch.compile usage).
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None) -> Path:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Resolution order: explicit argument, ``BSI_TPU_CACHE_DIR`` env var,
    ``.jax_cache`` next to the package. Call before the first compile; safe
    to call multiple times. Set ``BSI_TPU_CACHE_DIR=off`` to disable.
    """
    import jax

    env = os.environ.get("BSI_TPU_CACHE_DIR")
    if cache_dir is None and env:
        if env.lower() in ("off", "0", "none"):
            return _DEFAULT
        cache_dir = env
    path = Path(cache_dir) if cache_dir is not None else _DEFAULT
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    # Cache everything: over the remote-compile tunnel even small programs
    # pay round-trip latency, and entries are tiny.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
