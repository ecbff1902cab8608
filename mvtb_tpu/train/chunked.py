"""Chunked device-loop training: one dispatch per K steps.

Per-step host dispatch through this environment's remote-TPU tunnel costs
~0.5 s/step regardless of model size; running the step inside a jitted
``lax.fori_loop`` over a device-resident sample pool amortizes it to one
dispatch (plus one scalar fetch) per ``chunk`` steps — measured ~26x faster
at 64^3 and ~5x at 128^3 in the robustness-gain experiment. This is the
TPU-idiomatic shape of the reference's epoch loop (``baseline.py:232-248``)
when the working set fits HBM (a 64-volume BraTS-crop pool is ~1 GB).

The pool travels as jit arguments — closure capture would embed it as HLO
constants (pathological remote-compile uploads).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mvtb_tpu.ops.fused import StylizeConfig
from mvtb_tpu.train.seg import TrainState, seg_train_step

Array = jnp.ndarray


def make_chunk_fn(stylize: Optional[StylizeConfig]) -> Callable:
    """Build the jitted K-steps-per-dispatch training function.

    Returns ``chunk_fn(state, key, pool_images, pool_labels, idxs)`` where
    ``idxs`` is an (K, B) int array of pool rows per step; the state is
    donated (updated in place), and the MEAN loss over the chunk's steps is
    returned (the reference logs per-epoch mean loss, ``baseline.py:250``).
    """

    @partial(jax.jit, donate_argnums=(0,))
    def chunk_fn(state: TrainState, key: jax.Array, pool_i: Array,
                 pool_l: Array, idxs: Array):
        def body(i, carry):
            state, key, acc = carry
            key, sub = jax.random.split(key)
            img = jnp.take(pool_i, idxs[i], axis=0)
            lbl = jnp.take(pool_l, idxs[i], axis=0)
            state, loss = seg_train_step(state, img, lbl, sub, stylize)
            return (state, key, acc + loss.astype(jnp.float32))

        state, key, total = jax.lax.fori_loop(
            0, idxs.shape[0], body, (state, key, jnp.float32(0)))
        return (state, key, total / idxs.shape[0])

    return chunk_fn


def train_chunked(state: TrainState, pool_images: Array, pool_labels: Array,
                  *, steps: int, batch_size: int, key: jax.Array,
                  stylize: Optional[StylizeConfig] = None, chunk: int = 100,
                  sample_rng: Optional[np.random.RandomState] = None,
                  log: Callable[[str], None] = print,
                  name: str = "train") -> Tuple[TrainState, list]:
    """Drive :func:`make_chunk_fn` to ``steps`` steps; returns (state, loss
    history — one (step, loss) record per chunk)."""
    chunk_fn = make_chunk_fn(stylize)
    rng = sample_rng or np.random.RandomState(0)
    losses = []
    done = 0
    t0 = time.time()
    while done < steps:
        n = min(chunk, steps - done)
        idxs = jnp.asarray(rng.randint(0, pool_images.shape[0],
                                       (n, batch_size)))
        state, key, loss = chunk_fn(state, key, pool_images, pool_labels, idxs)
        done += n
        val = float(loss)  # host sync once per chunk
        losses.append({"step": done, "loss": val})
        log(f"[{name}] step {done}/{steps} loss {val:.4f} "
            f"({time.time() - t0:.0f}s)")
    return state, losses
