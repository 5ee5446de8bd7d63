import os

# Multi-chip sharding logic is tested on a virtual 8-device CPU mesh; the
# single real TPU (when present) is reserved for benchmarks.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
