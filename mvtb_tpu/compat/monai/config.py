"""``monai.config.print_config`` facade."""

from __future__ import annotations


def print_config() -> None:
    import jax
    import numpy as np

    print("mvtb_tpu monai compatibility shim")
    print(f"  backing framework: mvtb_tpu (JAX {jax.__version__}, "
          f"numpy {np.__version__})")
    try:
        print(f"  devices: {[str(d) for d in jax.devices()]}")
    except Exception:  # pragma: no cover - device probe best-effort
        print("  devices: <uninitialized>")
