#!/usr/bin/env python
"""Render a saved samples .npz into a PNG grid.

Equivalent of the reference's scripts/render_samples.py.

Usage: render_samples.py samples.npz out.png [--cols 8]
"""

from __future__ import annotations

import argparse
import math
from pathlib import Path

import numpy as np
from PIL import Image


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("samples")
    parser.add_argument("out")
    parser.add_argument("--cols", type=int, default=8)
    args = parser.parse_args()

    with np.load(args.samples) as z:
        samples = z["samples"]

    if samples.dtype != np.uint8:
        # continuous [-1, 1] data -> 8-bit
        samples = np.clip((samples + 1) / 2 * 255, 0, 255).astype(np.uint8)

    n, h, w, c = samples.shape
    cols = args.cols
    rows = math.ceil(n / cols)
    grid = np.zeros((rows * h, cols * w, c), np.uint8)
    for i, img in enumerate(samples):
        r, col = divmod(i, cols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = img
    if c == 1:
        grid = grid[..., 0]

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(grid).save(args.out)
    print(f"wrote {args.out} ({rows}x{cols} grid)")


if __name__ == "__main__":
    main()
