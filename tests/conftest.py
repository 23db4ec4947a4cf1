"""Test configuration: force an 8-device virtual CPU platform.

The container environment pins ``JAX_PLATFORMS=axon`` (a tunneled real TPU
chip); tests must NOT ride the tunnel — they run on a virtual 8-device CPU
mesh (``--xla_force_host_platform_device_count=8``) so multi-chip sharding
logic is testable without a pod, and Pallas kernels run in interpreter mode.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The sitecustomize in this image registers the axon backend regardless of
# env vars; this config update is the authoritative CPU override.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
