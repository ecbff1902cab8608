"""Sliding-window inference over large volumes.

TPU-native equivalent of MONAI's ``sliding_window_inference`` (used by the
reference's TCGA evaluation notebooks, SURVEY.md section 2.4): tile the
volume with an overlapping static grid, run the network over tiles in
batches, and blend with constant or Gaussian importance weighting. The tile
grid is computed at trace time, so the whole sweep compiles into one XLA
program with static shapes (no data-dependent control flow).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _grid_positions(size: int, roi: int, overlap: float) -> Tuple[int, ...]:
    """Start offsets covering [0, size) with ~overlap between tiles."""
    if size <= roi:
        return (0,)
    step = max(int(roi * (1.0 - overlap)), 1)
    starts = list(range(0, size - roi + 1, step))
    if starts[-1] != size - roi:
        starts.append(size - roi)
    return tuple(starts)


def _gaussian_importance(roi: Sequence[int], sigma_scale: float = 0.125) -> np.ndarray:
    """Separable Gaussian importance map (MONAI's BlendMode.GAUSSIAN)."""
    out = np.ones(tuple(roi), np.float32)
    for axis, n in enumerate(roi):
        center = (n - 1) / 2.0
        sigma = max(n * sigma_scale, 1e-3)
        g = np.exp(-0.5 * ((np.arange(n) - center) / sigma) ** 2).astype(np.float32)
        g = np.maximum(g, g.max() * 1e-3)  # avoid zero weights at borders
        shape = [1] * len(roi)
        shape[axis] = n
        out = out * g.reshape(shape)
    return out


def sliding_window_inference(
    image: Array,
    roi_size: Sequence[int],
    apply_fn: Callable,
    params,
    *,
    overlap: float = 0.25,
    mode: str = "constant",
    out_channels: int | None = None,
    tile_batch: int = 8,
    low_memory: bool | None = None,
) -> Array:
    """Tiled inference on channel-first input ``(B, C, *spatial)``.

    ``apply_fn({"params": params}, tile_cl)`` is called on channel-last tiles
    ``(chunk, *roi, C)`` and must return channel-last logits of the same
    spatial size. Returns channel-first logits ``(B, out_channels, *spatial)``.

    Tiles are flattened into the batch axis and run up to ``tile_batch``
    samples per forward (``lax.scan`` over chunks): a batch-1 volume no
    longer pays 27 underutilized batch-1 forwards — per-sample ops (convs,
    InstanceNorm) make this numerically identical to the per-tile loop.
    NOTE: batch-coupled ops (train-mode BatchNorm, cross-sample
    normalization) would couple tiles within a chunk; the reference's
    InstanceNorm UNets are per-sample, matching MONAI's ``sw_batch_size``
    semantics. ``tile_batch`` must be a static Python int (mark it static
    if you jit over this function yourself; ``make_sliding_window_fn``
    already does).

    Two measured schedules (round-3 ADVICE vs round-4 timing):

    * fast (default for grids whose tile tensors fit comfortably): gather
      all tiles up front, scan the forwards, blend with trace-time-static
      positions — 106 ms at the TCGA headline config.
    * ``low_memory=True``: gather AND blend inside the scan body, so peak
      HBM holds one chunk of tiles/logits plus the output accumulator
      instead of all T*B tile logits (fine overlap / small roi / huge
      volumes) — measured ~1.28x slower at the headline config (the
      blend's dynamic-index read-modify-writes serialize), hence opt-in.

    ``low_memory=None`` picks automatically: the scan-carried path engages
    when the materialized tile stack would exceed ~2 GB.
    """
    import operator

    try:
        tile_batch = operator.index(tile_batch)
    except TypeError:
        raise TypeError(
            "tile_batch must be a static Python int — when wrapping "
            "sliding_window_inference in jax.jit yourself, mark it static "
            "(static_argnames) or use make_sliding_window_fn") from None
    nd = len(roi_size)
    spatial = image.shape[2:]
    if len(spatial) != nd:
        raise ValueError(f"roi rank {nd} != spatial rank {len(spatial)}")

    # pad up to roi when the volume is smaller
    pads = [(0, max(r - s, 0)) for r, s in zip(roi_size, spatial)]
    if any(p[1] for p in pads):
        image = jnp.pad(image, [(0, 0), (0, 0)] + pads)
    padded = image.shape[2:]

    grids = [_grid_positions(padded[d], roi_size[d], overlap) for d in range(nd)]
    positions = [()]
    for axis_starts in grids:
        positions = [p + (s,) for p in positions for s in axis_starts]
    T = len(positions)

    if mode == "gaussian":
        importance_np = _gaussian_importance(roi_size)
    else:
        importance_np = np.ones(tuple(roi_size), np.float32)
    importance = jnp.asarray(importance_np)

    # Blend normalizer depends only on the static grid — build it on the host.
    norm_np = np.zeros(tuple(padded), np.float32)
    for pos in positions:
        sl = tuple(slice(s, s + r) for s, r in zip(pos, roi_size))
        norm_np[sl] += importance_np
    norm = jnp.asarray(norm_np)[None, ..., None]

    img_cl = jnp.moveaxis(image, 1, -1)  # (B, *padded, C)
    B = image.shape[0]
    C = img_cl.shape[-1]
    total = T * B

    # chunking: prefer the largest divisor of T*B <= tile_batch (no padded
    # forwards); fall back to padded+masked chunks when the best divisor
    # would underfill the MXU batch by more than half.
    tile_batch = max(1, min(tile_batch, total))
    chunk = max(d for d in range(1, tile_batch + 1) if total % d == 0)
    if chunk * 2 < tile_batch and total > tile_batch:
        chunk = tile_batch
    n_chunks = -(-total // chunk)
    pad_n = n_chunks * chunk - total

    if low_memory is None:
        # tile stack + logits resident at once; engage the scan-carried
        # blend only when that would be memory-trouble (~2 GB threshold)
        roi_elems = 1
        for r in roi_size:
            roi_elems *= int(r)
        est_oc = C if out_channels is None else max(C, out_channels)
        low_memory = total * roi_elems * est_oc * 4 > 2 << 30

    if not low_memory:
        # fast schedule: all tiles materialized, blend with static positions
        tiles = jnp.stack([
            jax.lax.dynamic_slice(img_cl, (0,) + tuple(pos) + (0,),
                                  (B,) + tuple(roi_size) + (C,))
            for pos in positions
        ]).reshape((total,) + tuple(roi_size) + (C,))
        if pad_n:
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((pad_n,) + tiles.shape[1:], tiles.dtype)])
        tiles = tiles.reshape((n_chunks, chunk) + tuple(roi_size) + (C,))

        def _fwd(_, t):
            return None, apply_fn({"params": params}, t).astype(jnp.float32)

        _, logits = jax.lax.scan(_fwd, None, tiles)
        oc = logits.shape[-1] if out_channels is None else out_channels
        logits = logits.reshape((n_chunks * chunk,) + tuple(roi_size) + (oc,))
        logits = logits[:total].reshape((T, B) + tuple(roi_size) + (oc,))

        out = jnp.zeros((B,) + tuple(padded) + (oc,), jnp.float32)
        w = importance[..., None]
        for i, pos in enumerate(positions):
            start = (0,) + tuple(pos) + (0,)
            sizes = (B,) + tuple(roi_size) + (oc,)
            out = jax.lax.dynamic_update_slice(
                out,
                jax.lax.dynamic_slice(out, start, sizes) + logits[i] * w,
                start)
        out = out / norm
        out = jnp.moveaxis(out, -1, 1)
        return out[(slice(None), slice(None)) +
                   tuple(slice(0, s) for s in spatial)]

    # flattened tile k -> (position index t = k // B, batch row b = k % B);
    # pad entries point at tile 0 and carry zero blend weight
    starts_np = np.zeros((n_chunks * chunk, nd + 2), np.int32)
    valid_np = np.zeros((n_chunks * chunk,), np.float32)
    for k in range(total):
        t, b = divmod(k, B)
        starts_np[k] = (b,) + tuple(positions[t]) + (0,)
        valid_np[k] = 1.0
    starts = jnp.asarray(starts_np).reshape(n_chunks, chunk, nd + 2)
    valid = jnp.asarray(valid_np).reshape(n_chunks, chunk)

    if out_channels is None:
        oc = jax.eval_shape(
            lambda t: apply_fn({"params": params}, t),
            jax.ShapeDtypeStruct((chunk,) + tuple(roi_size) + (C,),
                                 img_cl.dtype)).shape[-1]
    else:
        oc = out_channels
    w = importance[..., None]

    def _gather(s):
        tile = jax.lax.dynamic_slice(img_cl, s, (1,) + tuple(roi_size) + (C,))
        return tile[0]

    def _body(out, xs):
        s, v = xs  # (chunk, nd+2), (chunk,)
        tiles = jax.vmap(_gather)(s)  # (chunk, *roi, C)
        logits = apply_fn({"params": params}, tiles).astype(jnp.float32)
        # blend this chunk into the carried accumulator (O(chunk) residency)
        def blend(j, out):
            start = (s[j, 0],) + tuple(s[j, 1 + d] for d in range(nd)) + (0,)
            sizes = (1,) + tuple(roi_size) + (oc,)
            patch = jax.lax.dynamic_slice(out, start, sizes)
            patch = patch + (logits[j] * w * v[j])[None]
            return jax.lax.dynamic_update_slice(out, patch, start)

        out = jax.lax.fori_loop(0, chunk, blend, out)
        return out, None

    out = jnp.zeros((B,) + tuple(padded) + (oc,), jnp.float32)
    out, _ = jax.lax.scan(_body, out, (starts, valid))

    out = out / norm
    out = jnp.moveaxis(out, -1, 1)
    return out[(slice(None), slice(None)) + tuple(slice(0, s) for s in spatial)]


def make_sliding_window_fn(roi_size: Sequence[int], apply_fn: Callable,
                           overlap: float = 0.25, mode: str = "constant",
                           tile_batch: int = 8,
                           low_memory: bool | None = None):
    """jit-compiled closure over the tiling config (compile once per shape)."""
    return jax.jit(partial(sliding_window_inference, roi_size=tuple(roi_size),
                           apply_fn=apply_fn, overlap=overlap, mode=mode,
                           tile_batch=tile_batch, low_memory=low_memory),
                   static_argnames=())
