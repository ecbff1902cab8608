"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
paths compile and execute without TPU hardware (mirrors the driver's
``dryrun_multichip`` environment).

Note: this machine's axon sitecustomize imports jax at interpreter start and
forces ``jax_platforms="axon,cpu"``, so the env var alone is not enough — we
must also update the config after import (backends are still uninitialized
at conftest time, so the XLA flag takes effect).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
