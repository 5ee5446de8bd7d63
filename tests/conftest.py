import os

# Tests run on CPU with a virtual 8-device mesh: deterministic f32 math and
# multi-chip sharding logic without hardware. The axon TPU plugin registers
# itself from sitecustomize *before* pytest imports this file, so setting
# the environment variable alone is not enough — force the platform through
# jax.config as well (effective as long as no computation ran yet).
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
