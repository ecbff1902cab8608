"""Ahead-of-time serving artifacts (StableHLO export + params bundle).

The reference deploys nothing: its trained models exist as ``.pth`` state
dicts that only the original Python class tree can revive
(``/root/reference/source_code/utils.py:286-311`` rebuilds the MONAI UNet in
process to load one). For production serving on TPU the right artifact is a
compiler-level one: this module exports any jitted inference function to
serialized StableHLO via ``jax.export`` — a self-contained program that
reloads and runs **without the model's Python code**, pins the exact
compiled semantics (layouts, dtypes, fused augmentation included if the
caller baked it in), and can be lowered for several platforms at once so a
CPU host can produce a TPU-deployable artifact.

Two layers:

* :func:`export_fn` / :func:`load_fn` — function-level round trip,
  pytree args in, serialized bytes out.
* :class:`ServingBundle` — directory artifact for the common segmentation
  case: ``program.stablehlo`` (exported ``(params, image) -> logits``) +
  ``params.msgpack`` (flax-serialized weights) + ``meta.json``. ``load``
  returns a plain ``image -> logits`` callable.

Weights travel as *arguments*, not baked-in constants: the artifact stays
small, params swap without re-export (fine-tuned checkpoints reuse the same
program), and export never uploads 4.8M-weight constants through the slow
remote-compile path (see CLAUDE.md).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax import export as jax_export

__all__ = ["export_fn", "load_fn", "ServingBundle", "default_platforms"]


def default_platforms() -> Sequence[str]:
    """Platforms baked into an artifact by default.

    Always includes ``cpu`` (so artifacts exported on the TPU host remain
    testable anywhere) plus the current default backend if it is an
    accelerator. ``jax.export`` cross-lowers at trace time, so a CPU-only
    process can still emit a ``tpu`` artifact by passing
    ``platforms=("cpu", "tpu")`` explicitly.
    """
    current = jax_export.default_export_platform()
    return ("cpu",) if current == "cpu" else ("cpu", current)


def _abstractify(tree: Any) -> Any:
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), jax.dtypes.result_type(x)),
        tree)


def export_fn(fn: Callable, example_args: tuple, *,
              platforms: Optional[Sequence[str]] = None,
              polymorphic_shapes=None) -> bytes:
    """Serialize ``jit(fn)`` traced at ``example_args``'s shapes/dtypes.

    ``example_args`` may be real arrays or ``ShapeDtypeStruct``s — only
    avals are read. ``polymorphic_shapes`` (a pytree prefix of
    ``jax.export`` shape-spec strings, e.g. ``(None, "b, ...")`` to make
    the second argument's leading dim symbolic) produces one artifact that
    serves ANY size along the symbolic dims. The returned bytes are a
    versioned, self-contained StableHLO program.
    """
    if polymorphic_shapes is not None:
        args_specs = jax_export.symbolic_args_specs(example_args,
                                                    polymorphic_shapes)
    else:
        args_specs = _abstractify(example_args)
    exp = jax_export.export(
        jax.jit(fn),
        platforms=tuple(platforms) if platforms else tuple(default_platforms()),
    )(*args_specs)
    return bytes(exp.serialize())


def export_sharded_fn(fn: Callable, example_args: tuple, *,
                      in_shardings, out_shardings=None,
                      platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize a SHARDED program: ``jit(fn, in_shardings=...)`` traced at
    ``example_args``'s avals over the shardings' mesh.

    The artifact records the device-assignment topology; reload with
    :func:`load_fn` and call under a mesh with the same device count (the
    multi-chip serving path — SURVEY §2.5 parallelism obligations, exercised
    by ``__graft_entry__.dryrun_multichip``).
    """
    jitted = jax.jit(fn, in_shardings=in_shardings,
                     out_shardings=out_shardings)
    exp = jax_export.export(
        jitted,
        platforms=tuple(platforms) if platforms else tuple(default_platforms()),
    )(*_abstractify(example_args))
    return bytes(exp.serialize())


def load_fn(blob: bytes, *, jit: bool = True) -> Callable:
    """Inverse of :func:`export_fn`: bytes -> callable.

    The result validates shapes/dtypes against the exported signature and
    executes on any platform the artifact was lowered for.
    """
    exp = jax_export.deserialize(blob)
    return jax.jit(exp.call) if jit else exp.call


class ServingBundle:
    """Directory artifact: exported inference program + weights + metadata.

    ``save`` exports ``fn(params, *inputs)`` and writes::

        <path>/program.stablehlo   serialized jax.export program
        <path>/params.msgpack      flax-serialized params pytree
        <path>/meta.json           input shapes/dtypes, platforms, extras

    ``load`` needs no model code: it deserializes the program, restores the
    params against the recorded tree structure, and returns
    ``serve(*inputs)``. Params can be hot-swapped with ``load(..., params=)``
    (e.g. a newer checkpoint with the same architecture).
    """

    PROGRAM = "program.stablehlo"
    PARAMS = "params.msgpack"
    META = "meta.json"

    @classmethod
    def save(cls, path: str, fn: Callable, params: Any, example_inputs: tuple,
             *, platforms: Optional[Sequence[str]] = None,
             batch_polymorphic: bool = False,
             extra_meta: Optional[dict] = None) -> None:
        """``batch_polymorphic=True`` makes the batched inputs' leading dim
        a symbolic ``b``: one artifact serves any batch size (the example's
        batch size is only a trace shape). "Batched" means rank >= 1 with
        the same leading dim as the FIRST example input — side inputs like
        PRNG key data or scalars keep their concrete shapes (unifying their
        unrelated dims under ``b`` would pin the batch to the example's)."""
        import flax.serialization as fser

        os.makedirs(path, exist_ok=True)
        platforms = tuple(platforms) if platforms else tuple(default_platforms())
        poly = None
        if batch_polymorphic:
            lead = np.shape(example_inputs[0])[0]
            poly = (None,) + tuple(
                "b, ..." if (np.ndim(x) >= 1 and np.shape(x)[0] == lead)
                else None
                for x in example_inputs)
        blob = export_fn(fn, (params,) + tuple(example_inputs),
                         platforms=platforms, polymorphic_shapes=poly)
        with open(os.path.join(path, cls.PROGRAM), "wb") as f:
            f.write(blob)
        with open(os.path.join(path, cls.PARAMS), "wb") as f:
            f.write(fser.to_bytes(params))
        meta = {
            "platforms": list(platforms),
            "batch_polymorphic": bool(batch_polymorphic),
            "inputs": [{"shape": list(np.shape(x)),
                        "dtype": str(jax.dtypes.result_type(x))}
                       for x in example_inputs],
            **(extra_meta or {}),
        }
        with open(os.path.join(path, cls.META), "w") as f:
            json.dump(meta, f, indent=1)

    @classmethod
    def load(cls, path: str, *, params: Any = None,
             params_template: Any = None) -> Callable:
        """Return ``serve(*inputs)``.

        Without a template the params pytree is restored as nested dicts of
        arrays — exactly what the exported program's pytree signature
        expects, since flax params are plain dict pytrees. Pass ``params``
        to ignore the stored weights, or ``params_template`` to restore the
        stored bytes against a structure of your own.
        """
        import flax.serialization as fser

        with open(os.path.join(path, cls.PROGRAM), "rb") as f:
            call = load_fn(f.read())
        if params is None:
            with open(os.path.join(path, cls.PARAMS), "rb") as f:
                raw = f.read()
            if params_template is not None:
                params = fser.from_bytes(params_template, raw)
            else:
                params = _numpyify(fser.msgpack_restore(raw))

        def serve(*inputs):
            return call(params, *inputs)

        serve.params = params  # type: ignore[attr-defined]
        return serve

    @classmethod
    def meta(cls, path: str) -> dict:
        with open(os.path.join(path, cls.META)) as f:
            return json.load(f)


def _numpyify(tree: Any) -> Any:
    return jax.tree.map(np.asarray, tree)
